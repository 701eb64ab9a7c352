"""Streaming twin of the Kaplan-Meier survival curve.

``operators.temporal.km_curve`` multiplies the per-day survival
factors of the hazard life table in canonical day order (the
bit-portable fold).  The streaming form keeps the curve live on the
SAME state the hazard twin keeps — per-(batch, user) ``(min first
day, max last day)`` span partials; min/max are associative, so the
folded spans reproduce the batch per-user span EXACTLY — and each
publish re-runs the shared tail
(:func:`~gis_city_county_spark.operators.temporal.km_from_user_spans`)
over the folded spans, so the live curve is bit-equal to the batch
operator over all rows arrived so far (asserted batch-by-batch in
``tests/test_streaming.py``).  Late events extend a user's span (or
pull its start earlier); the censoring horizon, the at-risk suffix
sums and the survival product — all holistic over the
CALENDAR-bounded day frame, never the users — re-derive on the next
publish, exactly as a batch rerun would.

Replay-idempotent end to end (the hazard-twin pattern verbatim):
per-batch span partials are keyed by ``batch_id`` and deterministic
per batch, so a retried batch appends IDENTICAL rows and reads
collapse them with DISTINCT before the min/max fold; the publish
partition-overwrites by ``batch_id``.  A batch whose rows are all
filtered (NULL user/ts) still publishes the current curve under its
``batch_id`` — consumers key on ``max(batch_id)`` and must never read
a stale release as the newest.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def km_batch_folder(
    state_dir: str,
    report_dir: str,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    from gis_city_county_spark.operators.temporal import (
        km_from_user_spans,
    )

    spans_dir = f"{state_dir}/user_spans"

    def apply_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession

        inc = (
            batch_df.filter(
                F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .groupBy(F.col(user_col).alias("__u"))
            .agg(
                F.min(F.to_date(ts_col)).alias("__first"),
                F.max(F.to_date(ts_col)).alias("__last"),
            )
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        if not inc.isEmpty():
            inc.write.mode("append").parquet(spans_dir)
        # All-filtered / empty batches still publish over the existing
        # state (the shared empty-batch contract).  With no prior
        # state there is nothing to publish yet.
        try:
            state = sess.read.parquet(spans_dir)
        except Exception:  # no spans yet: first batch was empty
            return

        spans = (
            state.distinct()
            .groupBy("__u")
            .agg(
                F.min("__first").alias("__first"),
                F.max("__last").alias("__last"),
            )
        )
        report = km_from_user_spans(spans, churn_gap_days).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_km_curve(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's per-user
    span partials into state and publish the refreshed survival curve
    into the batch's ``batch_id`` partition of ``report_dir``.
    Returns a ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = km_batch_folder(
        state_dir, report_dir, user_col, ts_col, churn_gap_days
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
