"""gis_city_county_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capability surface of the reference
pipeline (Office-of-Digital-Services/gis-city-county, "BunnyHop" — an
arcpy-based GIS ETL job) as an idiomatic, scale-out Spark engine, and
extends it with the operators a large-scale (100 TB) training-data
pipeline needs: deduplication, similarity search, text analysis and
multimodal column plumbing.

Layout
------
- ``sources``   : readers / source resolution (SURVEY.md §2.1, S1–S7)
- ``functions`` : scalar expression builders (§2.3, F1–F12) — all
  JVM-side Column expressions, no Python UDFs in the hot path
- ``operators`` : relational + extension operators (§2.2/2.4/2.5/2.6,
  dedup, similarity, text stats, multimodal)
- ``plans``     : pipeline composition and plan-inspection helpers
- ``streaming`` : event-stream operators (batch + Structured Streaming)
- ``suite``     : the query suite wired into ``__spark_entry__.py``
  (each query has a DuckDB oracle twin for the correctness gate)

Everything here is built only on public PySpark APIs.
"""

__version__ = "0.1.0"

from gis_city_county_spark.session import get_spark  # noqa: F401
