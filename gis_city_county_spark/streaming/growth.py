"""Streaming twin of the weekly growth-accounting report.

``operators.temporal.growth_accounting`` decomposes weekly actives
into new / retained / resurrected / churned from one batch pass.  The
streaming form keeps the decomposition live: state is the slim
distinct ``(user, week)`` relation — bounded by actives × calendar
weeks, never the events — and each publish re-runs the shared tail
(:func:`~gis_city_county_spark.operators.temporal.
growth_from_user_weeks`) over the folded relation, so the live report
is bit-equal to the batch operator over all rows arrived so far
(asserted batch-by-batch in ``tests/test_streaming.py``).  Late
arrivals land naturally: a late (user, week) row re-classifies that
user's surrounding weeks on the next publish, exactly as a batch
rerun would.

Replay-idempotent end to end (the countmin-delta pattern): per-batch
``(user, week)`` partials are keyed by ``batch_id`` and deterministic
per batch, so a retried batch appends IDENTICAL rows and reads
collapse them with DISTINCT; the publish partition-overwrites by
``batch_id``.  A batch whose rows are all filtered (NULL user/ts)
still publishes the current report under its ``batch_id`` —
consumers key on ``max(batch_id)`` and must never read a stale
release as the newest.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def growth_batch_folder(
    state_dir: str,
    report_dir: str,
    user_col: str,
    ts_col: str,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    from gis_city_county_spark.operators.temporal import (
        growth_from_user_weeks,
    )

    weeks_dir = f"{state_dir}/user_weeks"

    def apply_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession

        inc = (
            batch_df.filter(
                F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                F.col(user_col).alias("__u"),
                F.date_trunc("week", F.col(ts_col)).alias("__w"),
            )
            .distinct()
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        if not inc.isEmpty():
            inc.write.mode("append").parquet(weeks_dir)
        # All-filtered / empty batches still publish over the existing
        # state (the shared empty-batch contract).  With no prior
        # state there is nothing to publish yet.
        try:
            state = sess.read.parquet(weeks_dir)
        except Exception:  # no user-weeks yet: first batch was empty
            return

        weeks = state.select("__u", "__w").distinct()
        report = growth_from_user_weeks(weeks).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_growth_accounting(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    user_col: str,
    ts_col: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's distinct
    (user, week) rows into state and publish the refreshed growth
    decomposition into the batch's ``batch_id`` partition of
    ``report_dir``.  Returns a ``DataStreamWriter`` — caller
    ``.start()``s it."""
    apply_batch = growth_batch_folder(state_dir, report_dir, user_col, ts_col)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
