"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`gis_city_county_spark.suite` — the engine's query
suite registry. The driver's verify runs ``entry(spark)`` as a smoke
check, runs each ``queries()[name]`` at sf=0.01 and compares it
against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gis_city_county_spark.suite import all_specs  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's attribute pipeline end-to-end
    (filter → scalar derivation → value-map → merge → join_field ×2 →
    dissolve rollup) on sf0.001."""
    from gis_city_county_spark.suite.parity import q_flagship_pipeline

    return q_flagship_pipeline(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    large-scale extension operators)."""
    return {spec.name: spec.fn for spec in all_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; non-SQL-expressible queries are omitted
    (driver then records the weaker rows-only check)."""
    return {spec.name: spec.oracle for spec in all_specs() if spec.oracle is not None}
