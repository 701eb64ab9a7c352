"""Streaming twin of the CUSUM changepoint screen.

``operators.temporal.cusum_changepoint`` derives the zero-filled
calendar, the exact-integer scaled cumulative deviations and the
argmax-|cusum| flag from one batch pass.  The streaming form keeps
the level-shift monitor live with the same calendar-bounded state as
the MAD twin: per-(batch, day) event-COUNT partials — counts are
associative, so summing partials reproduces the batch per-day count
EXACTLY — and each publish re-runs the shared tail
(:func:`~gis_city_county_spark.operators.temporal.cusum_from_day_counts`)
over the folded counts, so the live report is bit-equal to the batch
operator over all rows arrived so far (asserted batch-by-batch in
``tests/test_streaming.py``).  Late events add to their day's
partial; the grand totals, prefix sums and the changepoint argmax —
all holistic over the CALENDAR grid, never the events — re-derive on
the next publish, exactly as a batch rerun would.

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

from pyspark.sql import functions as F


def cusum_batch_folder(state_dir: str, report_dir: str, ts_col: str):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    from gis_city_county_spark.operators.temporal import (
        cusum_from_day_counts,
    )

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
        report = cusum_from_day_counts(counts).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_cusum_changepoint(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    ts_col: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's per-day
    count partials into state and publish the refreshed CUSUM report
    into the batch's ``batch_id`` partition of ``report_dir``.
    Returns a ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = cusum_batch_folder(state_dir, report_dir, ts_col)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
