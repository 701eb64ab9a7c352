"""Streaming twin of the day-of-week × hour seasonal baseline.

``operators.temporal.seasonal_baseline`` medians the zero-filled
calendar×24 grid and reports the top anomaly cells from one batch
pass.  The streaming form keeps that report live: state is the slim
per-(batch, day, hour) count relation — calendar-bounded, never the
events — and each publish re-runs the shared tail
(:func:`seasonal_from_counts`) over the folded counts, so the live
report is bit-equal to the batch operator over all rows arrived so
far (asserted batch-by-batch in ``tests/test_streaming.py``).

Replay-idempotent end to end (the countmin-delta pattern): per-batch
count partials are keyed by ``batch_id`` and deterministic per batch,
so a retried batch appends IDENTICAL rows and reads collapse them
with DISTINCT; the publish partition-overwrites by ``batch_id``.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def seasonal_batch_folder(
    state_dir: str,
    report_dir: str,
    ts_col: str,
    top_k: int = 20,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    from gis_city_county_spark.operators.temporal import seasonal_from_counts

    counts_dir = f"{state_dir}/cell_counts"

    def apply_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession

        inc = (
            batch_df.filter(F.col(ts_col).isNotNull())
            .groupBy(
                F.to_date(ts_col).alias("__day"),
                F.hour(ts_col).cast("int").alias("hour"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        if not inc.isEmpty():
            inc.write.mode("append").parquet(counts_dir)
        # All-filtered / empty batches still publish over the existing
        # state: consumers key on max(batch_id), so a skipped publish
        # would surface a stale release as the newest (round-9
        # ADVICE).  With no prior state there is nothing to publish.
        try:
            state = sess.read.parquet(counts_dir)
        except Exception:  # no counts yet: first batch was empty
            return

        counts = (
            state.distinct()
            .groupBy("__day", "hour")
            .agg(F.sum("__n").cast("bigint").alias("n_events"))
        )
        report = seasonal_from_counts(counts, top_k).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_seasonal_baseline(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    ts_col: str,
    top_k: int = 20,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's (day,
    hour) counts into state and publish the refreshed anomaly report
    into the batch's ``batch_id`` partition of ``report_dir``.
    Returns a ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = seasonal_batch_folder(state_dir, report_dir, ts_col, top_k)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
