"""Z-order layout queries (sources.layout).

The *write-side* skipping power of the Z-order layout is proven in
``tests/test_layout.py`` (per-file min/max boxes vs a single-column
sort). The suite query here pins the *key computation* — quantize +
bit-interleave — against the DuckDB twin, since every downstream
pruning guarantee rests on both engines agreeing on the key.

The two 8-bit dimensions are taken scale-free (``% 256`` of the
customer key and the order date's day index) so the same oracle text
is exact at every sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.sources.layout import zorder_key, zorder_key_sql
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec

_EPOCH = "1992-01-01"


def q_zorder_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders histogrammed by 1024-wide Z-key buckets over
    (custkey mod 256, order-day mod 256): per-bucket row count plus
    min/max of both dimensions — the box each bucket covers."""
    orders = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("date")) % 256).cast(
        "long"
    )
    z = zorder_key(x, y, bits=8)
    return (
        orders.select(
            x.alias("xq"), y.alias("yq"), (z / 1024).cast("long").alias("zbucket")
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("xq").alias("x_min"),
            F.max("xq").alias("x_max"),
            F.min("yq").alias("y_min"),
            F.max("yq").alias("y_max"),
        )
    )


_Z_ORACLE = f"""
WITH dims AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS xq,
         CAST(date_diff('day', DATE '{_EPOCH}', o_orderdate) % 256 AS BIGINT) AS yq
  FROM orders
),
keyed AS (
  SELECT xq, yq, CAST(({zorder_key_sql('xq', 'yq', bits=8)}) // 1024 AS BIGINT)
           AS zbucket
  FROM dims
)
SELECT zbucket, COUNT(*) AS n_orders,
       MIN(xq) AS x_min, MAX(xq) AS x_max,
       MIN(yq) AS y_min, MAX(yq) AS y_max
FROM keyed GROUP BY zbucket
"""


def q_hilbert_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders histogrammed by 1024-wide Hilbert-key buckets over the
    same (custkey mod 256, order-day mod 256) grid as the Z-order
    spec: per-bucket row count plus the dimension box — Hilbert
    buckets cover CONTIGUOUS squares, the locality Z-order gives up
    at quadrant seams."""
    from gis_city_county_spark.sources.layout import with_hilbert_key

    orders = load_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (
        F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("date")) % 256
    ).cast("long")
    keyed = with_hilbert_key(
        orders.select(x.alias("xq"), y.alias("yq")),
        F.col("xq"), F.col("yq"), bits=8,
    )
    return (
        keyed.select("xq", "yq", (F.col("hkey") / 1024).cast("long")
                     .alias("hbucket"))
        .groupBy("hbucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("xq").alias("x_min"),
            F.max("xq").alias("x_max"),
            F.min("yq").alias("y_min"),
            F.max("yq").alias("y_max"),
        )
    )


def _hilbert_oracle() -> str:
    from gis_city_county_spark.sources.layout import hilbert_key_sql

    return f"""
WITH dims AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS xq,
         CAST(date_diff('day', DATE '{_EPOCH}', o_orderdate) % 256
              AS BIGINT) AS yq
  FROM orders
),
{hilbert_key_sql("xq", "yq", bits=8)}
SELECT CAST(hkey // 1024 AS BIGINT) AS hbucket,
       COUNT(*) AS n_orders,
       MIN(xq) AS x_min, MAX(xq) AS x_max,
       MIN(yq) AS y_min, MAX(yq) AS y_max
FROM hilberted GROUP BY 1
"""


SPECS = [
    QuerySpec("layout_hilbert_key_hist", q_hilbert_hist, _hilbert_oracle()),
    QuerySpec("layout_zorder_key_hist", q_zorder_hist, _Z_ORACLE),
]
