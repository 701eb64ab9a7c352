"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline: a broadcast
cross-join of a small probe set against the corpus with the distance
computed in JVM array expressions (zip_with + aggregate fold — no
Python, no explode). At 100 TB the scale path is LSH bucketing
(random-hyperplane signatures, same banded-join shape as MinHash in
:mod:`dedup`) so probes only meet a bucket's worth of corpus.

Determinism: Spark's ``aggregate`` fold and DuckDB's
``list_dot_product`` both accumulate left-to-right in double, so the
dot products (and everything derived from them) are bit-identical —
verified empirically on the test embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (JVM-side)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def with_norm2(df: DataFrame, vec_col: str, out: str = "norm2") -> DataFrame:
    """Attach the squared L2 norm."""
    return df.withColumn(out, dot_product(F.col(vec_col), F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors per probe (self-matches excluded).

    ``probes`` must be small (it is broadcast); the corpus streams
    through one pass — no shuffle until the per-probe top-k window,
    which partitions by probe id. Norms are computed once per side,
    not per pair."""
    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    # Each corpus row is scored against every probe — row work scales
    # with |probes|, so a narrow scan must be spread across slots.
    corpus = rebalance_for_fanout(corpus, multiplier=8.0)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    c = c.withColumn("__cnorm2", dot_product(F.col("__cvec"), F.col("__cvec")))
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__pvec"))
    p = p.withColumn("__pnorm2", dot_product(F.col("__pvec"), F.col("__pvec")))

    joined = c.crossJoin(F.broadcast(p)).filter(F.col("neighbor_id") != F.col("probe_id"))
    cos = dot_product(F.col("__cvec"), F.col("__pvec")) / (
        F.sqrt("__pnorm2") * F.sqrt("__cnorm2")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_filter: str,
    k: int = 5,
) -> str:
    """DuckDB oracle twin (``list_dot_product`` accumulates in the
    same order as the Spark fold — bit-identical doubles).

    ``probe_filter`` must be fully qualified against alias ``p``,
    e.g. ``"p.vec_id % 50 = 0"``."""
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return f"""
WITH e AS (
  SELECT {id_col}, {vd} AS v,
         list_dot_product({vd}, {vd}) AS norm2
  FROM {table}
),
scored AS (
  SELECT p.{id_col} AS probe_id, c.{id_col} AS neighbor_id,
         list_dot_product(c.v, p.v) / (sqrt(p.norm2) * sqrt(c.norm2)) AS cosine
  FROM e c, e p
  WHERE c.{id_col} != p.{id_col}
    AND p.{id_col} IN (SELECT {id_col} FROM {table} p WHERE {probe_filter})
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine
FROM (
  SELECT probe_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {k}
"""
