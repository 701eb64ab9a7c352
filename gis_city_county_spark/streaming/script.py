"""Streaming twin of the Unicode-script composition profile.

``operators.textstats.script_profile`` is the pre-language-ID screen
a multilingual corpus census runs first.  The streaming form keeps
that census live as document batches arrive — at 100 TB the cost
avoided is re-scanning the corpus per feed drop; the incremental
state is one slim counter table (nine BIGINT columns per
(batch, group), the ``SCRIPT_PROFILE_COUNTERS`` of the shared build
path ``script_profile_counts``), never the documents.  Character
counts are exact BIGINT sums, so folding per-batch partials by
addition reproduces the batch aggregate exactly, and each publish
re-runs the shared exact-division tail
(``script_profile_from_counts``) — the published profile is
bit-equal to the batch operator over all documents arrived so far
(asserted batch-by-batch in ``tests/test_streaming.py``).

Replay-idempotent end to end (the quality-audit twin pattern
verbatim): per-batch counter rows are keyed by ``batch_id`` and
deterministic per batch, so a retried batch appends IDENTICAL rows
and reads collapse them with DISTINCT before the fold; the publish
partition-overwrites by ``batch_id`` (the card-publish pattern),
so a retry replaces its own partition, never appends a duplicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def script_profile_batch_folder(
    state_dir: str,
    profile_dir: str,
    group_col: str,
    text_col: str,
):
    """The foreachBatch fold, exposed as a plain ``(batch_df,
    batch_id)`` callable so the retry path is directly testable
    (calling it twice with the same batch must leave state and the
    published profile partition exactly as one call does)."""
    from gis_city_county_spark.operators.textstats import (
        SCRIPT_PROFILE_COUNTERS,
        script_profile_counts,
        script_profile_from_counts,
    )

    counts_dir = f"{state_dir}/script_counts"

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession

        # 1. Append this batch's per-group counter row(s), keyed by
        #    batch_id (a replay appends identical rows; reads are
        #    DISTINCT — two different batches with coincidentally
        #    equal counters stay distinct through the key).
        script_profile_counts(
            batch_df, group_col, text_col
        ).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ).write.mode("append").parquet(counts_dir)

        # 2. Publish the refreshed profile from state only: exact
        #    BIGINT sums per group + the same exact-division tail as
        #    the batch operator.
        state = sess.read.parquet(counts_dir).distinct()
        folded = state.groupBy("__g").agg(
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in SCRIPT_PROFILE_COUNTERS
            ]
        )
        current = script_profile_from_counts(folded, group_col).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        current.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(profile_dir)

    return apply_batch


def streaming_script_profile(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    profile_dir: str,
    group_col: str,
    text_col: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving document batch's
    script counters into the state and publish the refreshed
    per-group profile into its ``batch_id`` partition of
    ``profile_dir``.  Returns a ``DataStreamWriter`` — caller
    ``.start()``s it."""
    apply_batch = script_profile_batch_folder(
        state_dir, profile_dir, group_col, text_col
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
