"""Shared per-day COUNT state for calendar-frame streaming twins.

The MAD-anomaly and CUSUM-changepoint twins keep IDENTICAL state —
per-(batch, day) event-count partials (counts are associative, so
summing partials reproduces the batch per-day count EXACTLY) — and
differ only in the publish tail they re-run over the folded counts
(``mad_from_day_counts`` vs ``cusum_from_day_counts``).  This module
is that shared fold, parameterized by the tail, so the two twins
cannot drift from each other.

Replay-idempotent end to end (the countmin-delta pattern): per-batch
day-count partials are keyed by ``batch_id`` and deterministic per
batch, so a retried batch appends IDENTICAL rows and reads collapse
them with DISTINCT before the sum fold; the publish
partition-overwrites by ``batch_id`` (retries replace, never
duplicate).  A batch whose rows are all filtered (NULL ts) still
publishes the current report under its ``batch_id`` — consumers key
on ``max(batch_id)`` and must never read a stale release as the
newest.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daycount_batch_folder(
    state_dir: str,
    report_dir: str,
    ts_col: str,
    publish_tail: Callable[[DataFrame], DataFrame],
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable.
    ``publish_tail`` maps the folded sparse (__day DATE, __n BIGINT)
    relation to the report to publish."""
    counts_dir = f"{state_dir}/day_counts"

    def apply_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession

        inc = (
            batch_df.filter(F.col(ts_col).isNotNull())
            .groupBy(F.to_date(ts_col).alias("__day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        if not inc.isEmpty():
            inc.write.mode("append").parquet(counts_dir)
        # All-filtered / empty batches still publish over the existing
        # state (the round-9 ADVICE contract shared by every twin).
        # With no prior state there is nothing to publish yet.
        try:
            state = sess.read.parquet(counts_dir)
        except Exception:  # no counts yet: first batch was empty
            return

        counts = (
            state.distinct()  # a retried batch's identical partials collapse
            .groupBy("__day")
            .agg(F.sum("__n").cast("bigint").alias("__n"))
        )
        report = publish_tail(counts).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_daycount_report(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    ts_col: str,
    publish_tail: Callable[[DataFrame], DataFrame],
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer over the shared day-count fold.  Returns a
    ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = daycount_batch_folder(
        state_dir, report_dir, ts_col, publish_tail
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
