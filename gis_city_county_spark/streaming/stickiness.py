"""Streaming twin of the DAU/MAU stickiness report.

``operators.temporal.stickiness_report`` computes DAU over
trailing-window actives from one batch pass.  The streaming form
keeps that dashboard live: state is the slim distinct ``(user, day)``
relation — bounded by actives × calendar days, never the events — and
each publish re-runs the shared tail
(:func:`~gis_city_county_spark.operators.temporal.stickiness_from_days`)
over the folded relation, so the live report is bit-equal to the
batch operator over all rows arrived so far (asserted batch-by-batch
in ``tests/test_streaming.py``).

Replay-idempotent end to end (the countmin-delta pattern): per-batch
``(user, day)`` partials are keyed by ``batch_id`` and deterministic
per batch, so a retried batch appends IDENTICAL rows and reads
collapse them with DISTINCT; the publish partition-overwrites by
``batch_id`` (retries replace, never duplicate).  A batch whose rows
are all filtered (NULL user/ts) still publishes the current report
under its ``batch_id`` — consumers key on ``max(batch_id)`` and must
never read a stale release as the newest.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stickiness_batch_folder(
    state_dir: str,
    report_dir: str,
    user_col: str,
    ts_col: str,
    window_days: int = 28,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    from gis_city_county_spark.operators.temporal import stickiness_from_days

    days_dir = f"{state_dir}/user_days"

    def apply_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession

        inc = (
            batch_df.filter(
                F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                F.col(user_col).alias("__u"),
                F.date_trunc("day", F.col(ts_col)).alias("__day"),
            )
            .distinct()
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        if not inc.isEmpty():
            inc.write.mode("append").parquet(days_dir)
        # All-filtered / empty batches still publish over the existing
        # state (the round-9 ADVICE contract shared by every twin).
        # With no prior state there is nothing to publish yet.
        try:
            state = sess.read.parquet(days_dir)
        except Exception:  # no user-days yet: first batch was empty
            return

        days = state.select("__u", "__day").distinct()
        report = stickiness_from_days(days, window_days).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_stickiness_report(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    user_col: str,
    ts_col: str,
    window_days: int = 28,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's distinct
    (user, day) rows into state and publish the refreshed stickiness
    report into the batch's ``batch_id`` partition of ``report_dir``.
    Returns a ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = stickiness_batch_folder(
        state_dir, report_dir, user_col, ts_col, window_days
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
