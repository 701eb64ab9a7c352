"""Streaming twin of the RFM quintile scores.

``operators.temporal.rfm_scores`` cuts the user base into Recency /
Frequency / Monetary tiles from one batch pass.  The streaming form
keeps the SAME scores live as event batches arrive: state is the slim
per-(batch, user) partial — (max event day, event count, exact
DECIMAL value sum) — never the events themselves, and each publish
re-runs the shared tile tail (:func:`rfm_from_per_user`) over the
folded per-user frame, so the live release is bit-equal to the batch
operator over all rows arrived so far (asserted batch-by-batch in
``tests/test_streaming.py``).

Why the state keeps the DECIMAL sum instead of the milli integer the
report shows: the batch operator floors the TOTAL sum once —
``floor(Σv·1000)`` — and ``Σ floor(partial·1000)`` would drift a unit
per batch boundary.  Decimal addition is exact and associative, so
folding partial sums reproduces the one-shot sum bit-for-bit and the
single floor happens at publish time, exactly like the batch path.

Replay-idempotent end to end (the countmin-delta pattern): partials
are keyed by ``batch_id`` and deterministic per batch, so a retried
batch appends IDENTICAL rows and reads collapse them with DISTINCT;
the publish partition-overwrites by ``batch_id`` (retries replace,
never duplicate).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def rfm_batch_folder(
    state_dir: str,
    scores_dir: str,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    from gis_city_county_spark.operators.temporal import rfm_from_per_user

    partial_dir = f"{state_dir}/per_user_partials"

    def apply_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession

        # 1. This batch's per-user partials (NULL user/ts rows are out,
        #    matching the batch operator's filter).
        inc = (
            batch_df.filter(
                F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                F.col(user_col).alias("__u"),
                F.to_date(ts_col).alias("__d"),
                F.col(value_col).cast("decimal(38,10)").alias("__v"),
            )
            .groupBy("__u")
            .agg(
                F.max("__d").alias("__last"),
                F.count(F.lit(1)).cast("bigint").alias("__n"),
                F.coalesce(
                    F.sum("__v"), F.lit(0).cast("decimal(38,10)")
                ).cast("decimal(38,10)").alias("__s"),
            )
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        if not inc.isEmpty():
            inc.write.mode("append").parquet(partial_dir)
        # A batch whose rows were ALL filtered (or an empty trigger)
        # still gets a publish over the existing state: consumers key
        # on max(batch_id), and skipping the publish would leave the
        # newest partition pointing at a stale release (round-9
        # ADVICE).  With no prior state there is nothing to publish.
        try:
            state = sess.read.parquet(partial_dir)
        except Exception:  # no partials yet: first batch was empty
            return

        # 2. Fold state → per-user frame → shared tile tail → publish.
        per_user = (
            state.distinct()
            .groupBy("__u")
            .agg(
                F.max("__last").alias("__last"),
                F.sum("__n").cast("bigint").alias("frequency"),
                F.sum("__s").cast("decimal(38,10)").alias("__sum"),
            )
            .select(
                "__u",
                "__last",
                "frequency",
                F.floor(F.col("__sum").cast("decimal(28,10)") * 1000)
                .cast("bigint").alias("monetary_milli"),
            )
        )
        scores = rfm_from_per_user(per_user, n_tiles).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        scores.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(scores_dir)

    return apply_batch


def streaming_rfm_scores(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    scores_dir: str,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's per-user
    partials into state and publish the refreshed RFM scores into the
    batch's ``batch_id`` partition of ``scores_dir``.  Returns a
    ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = rfm_batch_folder(
        state_dir, scores_dir, user_col, ts_col, value_col, n_tiles
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
