"""Token-budget sequence packing for training-data shards.

Assign documents to fixed-budget packs (context windows / shard
files) without splitting a document: within each shard key, order
documents deterministically (md5 of the id — uniform, reproducible on
any engine and any partitioning), take the *exclusive* running total
of the size column, and bin by ``running_total div budget``.

Semantics: contiguous deterministic binning — a pack may overflow its
budget by at most one document (the one straddling the boundary
stays in the pack where it started). This is the relational,
order-independent form; exact greedy repacking (reset the remainder
at each boundary) is sequential by nature and belongs in the consumer
if byte-exact budgets matter.

Scale: one shuffle on the shard key + one window scan. Shard keys
(language, source, date) keep groups bounded; an unsharded corpus
would funnel into one partition — shard first, that's what the
``shard_cols`` argument is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    shard_cols: list[str],
    id_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Per-row pack assignment: (input row, pack_id, pack_offset)."""
    order = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("pack_offset", offset).withColumn(
        "pack_id", F.expr(f"pack_offset div {budget}")
    )


def pack_summary(
    df: DataFrame, shard_cols: list[str], id_col: str, size_col: str, budget: int
) -> DataFrame:
    """Per-pack rollup: document count and total size."""
    packed = pack_sequences(df, shard_cols, id_col, size_col, budget)
    return packed.groupBy(*shard_cols, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).cast("long").alias("pack_size"),
    )


def pack_summary_sql(
    table_sql: str, shard_cols: list[str], id_col: str, size_col: str, budget: int
) -> str:
    keys = ", ".join(shard_cols)
    return f"""
WITH packed AS (
  SELECT *,
         CAST(COALESCE(SUM({size_col}) OVER (
             PARTITION BY {keys}
             ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS pack_offset
  FROM ({table_sql})
)
SELECT {keys}, pack_offset // {budget} AS pack_id,
       COUNT(*) AS n_docs, CAST(SUM({size_col}) AS BIGINT) AS pack_size
FROM packed
GROUP BY {keys}, pack_offset // {budget}
"""
