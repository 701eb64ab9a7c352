"""Scale helpers: partitioning decisions Catalyst cannot make.

Catalyst/AQE rebalance *after* shuffles, but the number of tasks in a
scan stage is fixed by file splits. When a narrow input (one parquet
file, one row group) feeds an explode-style fan-out (k-shingling is a
~100x row multiplier), the entire fan-out runs in as many tasks as
the scan had splits — one straggler task on a 32-slot cluster. The
fix is an explicit round-robin repartition *before* the fan-out,
applied only when the scan yields fewer splits than the cluster has
slots; on a real 100 TB scan the split count already exceeds
parallelism and this is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_fanout(df: DataFrame, multiplier: float = 8.0) -> DataFrame:
    """Repartition ``df`` to cluster parallelism iff its current plan
    produces materially fewer partitions than the cluster has slots.

    ``multiplier`` documents the expected row fan-out of the stage the
    caller is about to run (explode/posexplode); it gates the helper —
    stages that don't multiply rows shouldn't pay a shuffle.
    """
    if multiplier < 2.0:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # inputFiles() is a driver-side metadata lookup (no job, no
    # plan-to-RDD conversion). File count under-estimates split count
    # for large files (maxPartitionBytes splits them further), which
    # only errs toward skipping the shuffle on inputs that are already
    # wide — the safe direction.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df.repartition(target)
    if n_files and n_files * 2 <= target:
        return df.repartition(target)
    return df
