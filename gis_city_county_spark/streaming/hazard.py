"""Streaming twin of the discrete-time churn hazard life table.

``operators.temporal.hazard_table`` builds the per-day at-risk /
churned / censored decomposition from one batch pass.  The streaming
form keeps the life table live with the slimmest state of all the
twins: per-(batch, user) ``(min first day, max last day)`` partials —
min/max are associative, so folding partial spans reproduces the
batch per-user span EXACTLY, and each publish re-runs the shared tail
(:func:`~gis_city_county_spark.operators.temporal.
hazard_from_user_spans`) over the folded spans.  Late events extend a
user's span (or pull its start earlier) and the whole table —
including the censoring horizon — re-derives on the next publish,
exactly as a batch rerun would (asserted batch-by-batch in
``tests/test_streaming.py``).

Replay-idempotent end to end (the countmin-delta pattern): per-batch
span partials are keyed by ``batch_id`` and deterministic per batch,
so a retried batch appends IDENTICAL rows and reads collapse them
with DISTINCT before the min/max fold; the publish
partition-overwrites by ``batch_id``.  A batch whose rows are all
filtered (NULL user/ts) still publishes the current table under its
``batch_id`` — consumers key on ``max(batch_id)`` and must never
read a stale release as the newest.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def hazard_batch_folder(
    state_dir: str,
    report_dir: str,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    from gis_city_county_spark.operators.temporal import (
        hazard_from_user_spans,
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
        report = hazard_from_user_spans(spans, churn_gap_days).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_hazard_table(
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
    span partials into state and publish the refreshed hazard life
    table into the batch's ``batch_id`` partition of ``report_dir``.
    Returns a ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = hazard_batch_folder(
        state_dir, report_dir, user_col, ts_col, churn_gap_days
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
