"""Streaming twin of the Gopher/C4 quality-rule audit.

``operators.corpus.quality_rule_audit`` is the per-source per-rule
drop accounting a filtering pipeline publishes.  The streaming form
maintains that SAME audit incrementally as document batches arrive —
at 100 TB the cost avoided is re-scanning the whole corpus per feed
drop; the incremental state is one slim counter table (a handful of
BIGINT columns per (batch, source)), never the documents.

State layout (parquet, append-only, replay-idempotent):

* ``counts_dir`` — one row of map-combinable rule counters PER
  (batch_id, group), straight from the shared build path
  ``quality_rule_counts`` (the batch audit is the same aggregate plus
  one exact division, so folded sums are bit-equal by associativity
  of integer addition).  A retried batch appends an IDENTICAL row
  (same batch_id), and the audit reads the counters through DISTINCT,
  so replays are no-ops.

After folding a batch in, the current audit (bit-equal to running
``quality_rule_audit`` over every document arrived so far) is
published into its ``batch_id`` partition of ``audit_dir`` with
dynamic partition overwrite — a retried batch replaces its own
partition, never appends a duplicate (the card-publish pattern,
``streaming/card.py``).  Equivalence is asserted batch-by-batch in
``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def quality_audit_batch_folder(
    state_dir: str,
    audit_dir: str,
    group_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 1000,
):
    """The foreachBatch fold, exposed as a plain ``(batch_df,
    batch_id)`` callable so the retry path is directly testable
    (calling it twice with the same batch must leave state and the
    published audit partition exactly as one call does)."""
    from gis_city_county_spark.operators.corpus import (
        QUALITY_RULE_COUNTERS,
        quality_rule_counts,
    )

    counts_dir = f"{state_dir}/rule_counts"

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession

        # 1. Append this batch's per-group counter row(s), keyed by
        #    batch_id (a replay appends identical rows; reads are
        #    DISTINCT — two different batches with coincidentally
        #    equal counters stay distinct through the key).
        quality_rule_counts(
            batch_df, group_col, text_col, min_words, max_words
        ).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ).write.mode("append").parquet(counts_dir)

        # 2. Publish the refreshed audit from state only: exact BIGINT
        #    sums per group + the same single exact division as the
        #    batch audit.
        state = sess.read.parquet(counts_dir).distinct()
        current = (
            state.groupBy(group_col)
            .agg(
                *[
                    F.sum(c).cast("bigint").alias(c)
                    for c in QUALITY_RULE_COUNTERS
                ]
            )
            .select(
                group_col,
                *QUALITY_RULE_COUNTERS,
                F.expr(
                    "(n_clean * CAST(1000000 AS BIGINT)) div n_docs"
                ).alias("clean_ppm"),
                F.lit(batch_id).cast("bigint").alias("batch_id"),
            )
        )
        current.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(audit_dir)

    return apply_batch


def streaming_quality_rule_audit(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    audit_dir: str,
    group_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 1000,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving document batch's rule
    counters into the state and publish the refreshed per-source audit
    into its ``batch_id`` partition of ``audit_dir``.  Returns a
    ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = quality_audit_batch_folder(
        state_dir, audit_dir, group_col, text_col, min_words, max_words
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
