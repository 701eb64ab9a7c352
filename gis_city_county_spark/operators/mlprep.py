"""ML feature-preparation operators: the hashing trick and one-hot
encoding as pure relational programs.

The hashing trick maps an unbounded token vocabulary into a fixed
``n_buckets``-dimensional sparse vector without any fitted state — no
vocabulary table, no dictionary broadcast, nothing to keep in sync
across training runs. That statelessness is what makes it the 100 TB
default: every executor computes buckets independently from the token
bytes alone.

Hash function: md5 tail (identical on Spark / DuckDB / Python) rather
than murmur3 — Spark's ``hash()`` has no DuckDB twin, and the oracle
contract needs bit-equal bucket ids on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gis_city_county_spark.operators.textstats import tokens, tokens_sql


def _bucket_expr(tok_expr: str, n_buckets: int) -> str:
    """Spark SQL: md5 tail (last 8 hex chars → 32-bit int) mod n."""
    return (
        f"cast(conv(substring(md5({tok_expr}), 25, 8), 16, 10) as bigint)"
        f" % {n_buckets}"
    )


def hash_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Hashing-trick featurization: tokens → md5 buckets → per-doc
    sparse vector as parallel sorted arrays (indices, counts).

    Relational shape: one explode (bounded by tokens-per-doc), one
    (id, bucket) count aggregate — map-side combinable, so shuffle
    volume is the *distinct* (doc, bucket) pairs, ≤ min(tokens,
    n_buckets) per doc — then one ``collect_list(struct)`` per doc
    re-assembled into sorted arrays. Output rows = input rows; no
    stage depends on vocabulary size.

    Output: ``(id, n_tokens, n_active, indices: array<int>,
    counts: array<bigint>)``."""
    toks = df.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("bucket", F.expr(_bucket_expr("tok", n_buckets)).cast("int"))
    per_bucket = toks.groupBy("__id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    pairs = F.sort_array(F.collect_list(F.struct("bucket", "c")))
    return (
        per_bucket.groupBy("__id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_active"),
            pairs.alias("__pairs"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "n_active",
            F.expr("transform(__pairs, p -> p.bucket)").alias("indices"),
            F.expr("transform(__pairs, p -> p.c)").alias("counts"),
        )
    )


def hash_features_sql(
    table_sql: str, id_col: str, text_col: str, n_buckets: int = 256
) -> str:
    """DuckDB oracle twin of :func:`hash_features`."""
    bucket = (
        f"CAST(('0x' || substr(md5(t.tok), 25, 8))::BIGINT % {n_buckets}"
        " AS INTEGER)"
    )
    return f"""
WITH toks AS (
  SELECT id, {bucket} AS bucket
  FROM (SELECT {id_col} AS id, {tokens_sql(text_col)} AS tl FROM ({table_sql})) s,
       LATERAL UNNEST(s.tl) AS t(tok)
),
per_bucket AS (
  SELECT id, bucket, COUNT(*) AS c FROM toks GROUP BY 1, 2
)
SELECT id AS {id_col},
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_active,
       list(bucket ORDER BY bucket) AS indices,
       list(c ORDER BY bucket) AS counts
FROM per_bucket GROUP BY id
"""


def one_hot(
    df: DataFrame, col: str, categories: list[str], out: str = "onehot"
) -> DataFrame:
    """Fixed-vocabulary one-hot encoding: a dense 0/1 int array in the
    order of ``categories`` (values outside the list encode as all
    zeros — the drop-unknown convention). Pure projection: no shuffle,
    no fitted state, codegen-friendly."""
    vec = F.array(
        *[(F.col(col) == F.lit(c)).cast("int") for c in categories]
    )
    return df.withColumn(out, vec)


def one_hot_sql(col: str, categories: list[str], out: str = "onehot") -> str:
    """DuckDB expression twin of :func:`one_hot` (select-list
    fragment)."""
    items = ", ".join(
        f"CAST({col} = '" + c.replace("'", "''") + "' AS INTEGER)"
        for c in categories
    )
    return f"[{items}] AS {out}"
