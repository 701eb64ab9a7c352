"""Deterministic sketches and samples.

Spark ships HLL (``approx_count_distinct``) and quantile sketches, but
their results are implementation-defined — useless for cross-engine
verification and for reproducible pipeline runs. These operators are
the deterministic equivalents a training-data pipeline wants: the same
input always produces the same sample / estimate, on any engine, at
any parallelism, under any partitioning.

* ``kmv_distinct`` — K-Minimum-Values distinct-count estimator
  (Bar-Yossef et al. 2002): hash every value with md5, keep the k
  smallest distinct hashes per group; if fewer than k exist the count
  is exact, else estimate (k-1) / fraction(h_k). Per-group state is
  bounded at k hashes regardless of cardinality.
* ``hash_sample`` — deterministic Bernoulli sample: keep rows whose
  md5(key) falls below ``fraction`` of the hash space. Unlike
  ``df.sample()`` (seeded per-partition RNG — resampling under
  repartition), membership depends only on the key, so the sample is
  stable across runs, engines, and layout changes, and consistent
  across tables sharing the key (sample orders ⇒ their lineitems by
  the same predicate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit prefix of the md5 as a non-negative long; identical in DuckDB
# via CAST('0x' || substr(md5(x), 1, 15) AS BIGINT).
_SPACE = float(1 << 60)


def _h60(col: Column) -> Column:
    return _hex60(F.md5(col))


def _h60_sql(expr: str) -> str:
    return _hex60_sql(f"md5({expr})")


def _hex60(hexcol: Column) -> Column:
    """First 60 bits of an md5 hex string as a non-negative long."""
    return F.conv(F.substring(hexcol, 1, 15), 16, 10).cast("long")


def _hex60_sql(hex_expr: str) -> str:
    return f"CAST('0x' || substr({hex_expr}, 1, 15) AS BIGINT)"


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate: (group..., n_kept, kth_hash,
    distinct_est). Plan: distinct (group, hash) → per-group rank by
    hash → keep k smallest → one-row-per-group aggregate. Both
    shuffles key on the group; the rank window reuses the distinct's
    hash partitioning (Catalyst elides the second exchange)."""
    hashes = df.select(
        *[F.col(c) for c in group_cols],
        # Hash the canonical string form so Spark and any oracle agree
        # bit-for-bit (integers render identically; pass strings for
        # float-valued columns).
        F.md5(F.col(value_col).cast("string")).alias("__h"),
    ).dropDuplicates(group_cols + ["__h"])
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    frac = _hex60(F.col("kth_hash")).cast("double") / F.lit(_SPACE)
    return (
        kept.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("__h").alias("kth_hash"))
        .withColumn(
            "distinct_est",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                F.lit(float(k - 1)) / frac
            ),
        )
    )


def kmv_distinct_sql(
    table_sql: str, group_cols: list[str], value_col: str, k: int = 64
) -> str:
    keys = ", ".join(group_cols)
    return f"""
WITH hashes AS (
  SELECT DISTINCT {keys}, md5(CAST({value_col} AS VARCHAR)) AS h FROM ({table_sql})
),
ranked AS (
  SELECT {keys}, h,
         ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY h) AS rn
  FROM hashes
),
kept AS (SELECT * FROM ranked WHERE rn <= {k})
SELECT {keys}, COUNT(*) AS n_kept, MAX(h) AS kth_hash,
       CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
            ELSE {float(k - 1)} / (CAST({_hex60_sql("MAX(h)")} AS DOUBLE) / {_SPACE})
       END AS distinct_est
FROM kept GROUP BY {keys}
"""


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli sample of ~``fraction`` keyed on
    ``key_col``. A filter — pushes down to the scan like any other
    predicate; no shuffle, no RNG state."""
    cut = int(fraction * _SPACE)
    return df.filter(_h60(F.col(key_col).cast("string")) < cut)


def hash_sample_predicate_sql(key_expr: str, fraction: float) -> str:
    cut = int(fraction * _SPACE)
    return f"{_h60_sql(f'CAST({key_expr} AS VARCHAR)')} < {cut}"


def quota_sample(
    df: DataFrame, group_cols: list[str], id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic per-group quota sample: rank rows inside each
    group by md5(id) (a uniform, engine-independent order) and keep
    the first ``n_per_group`` — the training-mix pattern "at most N
    documents per language/source".

    One shuffle on the group key. For pathologically hot groups,
    pre-filter with :func:`hash_sample` at ~2·n/|group| before the
    exact rank so the window never sorts the full group; the final
    result is identical because both stages use the same hash order.
    """
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col))
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= n_per_group
    )


def quota_sample_sql(
    table_sql: str, group_cols: list[str], id_col: str, n_per_group: int
) -> str:
    keys = ", ".join(group_cols)
    return f"""
SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY {keys}
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS sample_rank
  FROM ({table_sql})
) WHERE sample_rank <= {n_per_group}
"""


def weighted_hash_sample(
    df: DataFrame, key_col: str, weight: Column
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row iff its
    hash point ``md5(key)/2^60 ∈ [0,1)`` falls below its (clamped to
    [0,1]) ``weight`` — Poisson-style importance sampling with zero
    RNG state. Like :func:`hash_sample`, membership depends only on
    the key and weight, so the sample is stable across runs, engines,
    partitionings, and incremental rebuilds; unlike it, inclusion
    probability varies per row (e.g. upweight long documents).
    A pure filter: pushes to the scan, no shuffle."""
    u = _h60(F.col(key_col).cast("string")).cast("double") / F.lit(_SPACE)
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight))
    return df.filter(u < w)


def weighted_hash_sample_predicate_sql(key_expr: str, weight_expr: str) -> str:
    u = f"CAST({_h60_sql(f'CAST({key_expr} AS VARCHAR)')} AS DOUBLE) / {_SPACE}"
    return f"{u} < least(1.0, greatest(0.0, {weight_expr}))"
