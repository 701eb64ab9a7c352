"""Data-layout operators: partitioned and bucketed storage.

At 100 TB the dominant costs are (a) scanning data a query doesn't
need and (b) shuffling for joins/aggregations on the same keys over
and over. Both are layout problems, solved at *write* time:

* ``write_partitioned`` — hive-style directory partitioning on a
  low-cardinality column (date, language, source). Readers with a
  predicate on the partition column never open the other directories
  (partition pruning happens at planning; visible as
  ``PartitionFilters`` in the scan node). ``repartition`` on the
  partition columns first, so each output directory is written by the
  tasks owning its rows — without it every task writes a file into
  every partition dir (the small-files explosion).
* ``write_bucketed`` — hash-bucket (and sort) rows by join/agg key
  into a fixed bucket count, persisted as a table. Two tables
  co-bucketed on the join key join with ZERO exchanges: the bucketing
  satisfies both sides' distribution requirement, so Catalyst plans a
  sort-merge join straight off the scans. Same for ``groupBy`` on the
  bucket key. This is the "pay the shuffle once at ingest, never
  again" pattern.

Both are thin wrappers over the stock DataFrameWriter — the value is
the enforced invariants (repartition-before-partitioned-write, sorted
buckets, deterministic bucket counts) plus the plan-shape tests in
``tests/test_layout.py`` proving pruning/shuffle-elision actually
engages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write hive-partitioned parquet, one writer set per partition."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a hive-partitioned dataset; partition-column predicates
    prune directories at planning time."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted external table (registered in the
    session catalog; data at ``path``). ``num_buckets`` should be
    sized so one bucket of the *final* dataset fits an executor core's
    working memory — it cannot change without a rewrite."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def co_bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts this plans with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
