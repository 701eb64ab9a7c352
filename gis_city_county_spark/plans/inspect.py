"""Physical-plan inspection — makes plan quality assertable.

The scale properties that matter at 100 TB (filters reaching the
parquet scan, column pruning, broadcast joins for dimensions, shuffle
counts, whole-stage codegen coverage) are all visible in
``df.explain("formatted")`` output. These helpers parse that output so
tests can pin the properties down — a regressed plan (lost pushdown, a
broadcast that became a shuffle join) fails CI instead of silently
becoming a cluster bottleneck.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _explain(df: DataFrame, mode: str) -> str:
    # the same JVM entry point DataFrame.explain() prints through
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All predicates the parquet source accepted for pushdown."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the columns actually read (pruning
    evidence: a 2-column projection must not read 16 columns)."""
    return re.findall(r"ReadSchema:\s*(\S+)", formatted_plan(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column-name sets per scan, parsed from ReadSchema structs."""
    cols = []
    for schema in read_schemas(df):
        cols.append(set(re.findall(r"(\w+):", schema)))
    return cols


def num_shuffles(df: DataFrame) -> int:
    """Distinct Exchange operators in the initial physical plan (AQE
    may later coalesce them, never add). Node ids dedupe the tree line
    vs. detail section of the formatted output."""
    return len(set(re.findall(r"Exchange \((\d+)\)", formatted_plan(df))))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_cartesian_or_bnlj(df: DataFrame) -> bool:
    """True if the plan degraded to a product join — with an
    equi-condition present this is a red flag at scale (intentional
    for small broadcast cross joins only)."""
    p = formatted_plan(df)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def num_lambda_filters(df: DataFrame) -> int:
    """Physical Filter nodes whose condition evaluates a higher-order
    function (``lambdafunction(...)`` in the condition text).

    This is the signature of ``InferFiltersFromGenerate`` + predicate
    pushdown re-materializing an exploded array EXPRESSION into a
    Filter: exploding an aliased attribute lets the optimizer infer
    ``size(col) > 0 AND isnotnull(col)`` and push it through the
    defining Project, duplicating the whole interpreted
    transform/array_distinct subtree per input row — and usually into
    the single-task scan stage (the r12 shingle-family 3–6×
    regression). Compose array expressions INLINE into ``explode``
    instead; zero is the target suite-wide."""
    return len(
        re.findall(r"Condition : .*lambdafunction", formatted_plan(df))
    )


def num_single_partition_exchanges(df: DataFrame) -> int:
    """SinglePartition exchanges — each funnels its entire input
    through ONE task (the plan shape behind the "WindowExec: No
    Partition Defined" warning). Zero is the target for full-data
    paths; a bounded aggregate (e.g. a per-bucket boundary table) may
    legitimately contribute one.

    Counted from the formatted plan's Exchange detail lines
    (``Arguments: SinglePartition, ...``) — the simple-plan spelling
    ``Exchange SinglePartition`` does not appear in formatted mode."""
    return len(re.findall(r"Arguments: SinglePartition", formatted_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans — fewer spans over the same
    ops = wider fusion."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimate of the relation's size (parquet footers ×
    filter selectivity heuristics) — the same number the planner uses
    for broadcast decisions. Cheap (no job)."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def recommended_shuffle_partitions(
    df: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 1,
    max_partitions: int = 200_000,
) -> int:
    """Spill-aware shuffle-partition count: size the shuffle so one
    partition ≈ ``target_partition_bytes`` (default 128 MB — small
    enough to sort/aggregate in an executor core's working memory,
    large enough to amortize task overhead). This is the number to
    pass to ``repartition``/``spark.sql.shuffle.partitions`` before a
    wide stage over ``df`` at any scale — it grows with the data
    instead of being a fixed constant that spills at 100× the test
    SF. AQE's runtime coalesce then trims over-provisioning for free;
    it cannot SPLIT an under-provisioned partition that already
    spilled, which is why sizing up front still matters."""
    est = estimated_size_bytes(df)
    # Relations without stats (JDBC/RDD-backed/DSv2 leaves) report
    # spark.sql.defaultSizeInBytes = Long.MaxValue — sizing from the
    # sentinel would emit a max_partitions-task shuffle for a tiny
    # table. Fall back to the session's configured shuffle parallelism.
    if est >= (1 << 62):
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n = max(min_partitions, -(-est // max(target_partition_bytes, 1)))
    return int(min(n, max_partitions))


def sized_repartition(df: DataFrame, *cols: str, target_partition_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """``repartition`` on ``cols`` with a data-derived partition count
    (see :func:`recommended_shuffle_partitions`)."""
    n = recommended_shuffle_partitions(df, target_partition_bytes)
    return df.repartition(n, *[F.col(c) for c in cols])
