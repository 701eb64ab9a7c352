"""Streaming twin of the encoding-damage census.

``operators.textstats.encoding_anomaly`` is the corpus-quality
screen for mojibake / U+FFFD / C0-control damage.  The streaming
form keeps that census live as document batches arrive — a broken
extraction stage shows up as a rate step in the NEXT publish instead
of at the next full-corpus scan; the incremental state is one slim
counter table (four BIGINT columns per (batch, group), the
``ENCODING_ANOMALY_COUNTERS`` of the shared build path
``encoding_anomaly_counts``), never the documents.  All counters are
exact BIGINT sums, so folding per-batch partials by addition
reproduces the batch aggregate exactly, and each publish re-runs the
shared exact-division tail (``encoding_anomaly_from_counts``) — the
published census is bit-equal to the batch operator over all
documents arrived so far (asserted batch-by-batch in
``tests/test_streaming.py``).

Replay-idempotent end to end (the quality-audit / script-census twin
pattern verbatim): per-batch counter rows are keyed by ``batch_id``
and deterministic per batch, so a retried batch appends IDENTICAL
rows and reads collapse them with DISTINCT before the fold; the
publish partition-overwrites by ``batch_id`` (the card-publish
pattern), so a retry replaces its own partition, never appends a
duplicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def encoding_census_batch_folder(
    state_dir: str,
    census_dir: str,
    group_col: str,
    text_col: str,
):
    """The foreachBatch fold, exposed as a plain ``(batch_df,
    batch_id)`` callable so the retry path is directly testable
    (calling it twice with the same batch must leave state and the
    published census partition exactly as one call does)."""
    from gis_city_county_spark.operators.textstats import (
        ENCODING_ANOMALY_COUNTERS,
        encoding_anomaly_counts,
        encoding_anomaly_from_counts,
    )

    counts_dir = f"{state_dir}/encoding_counts"

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession

        # 1. Append this batch's per-group counter row(s), keyed by
        #    batch_id (a replay appends identical rows; reads are
        #    DISTINCT — two different batches with coincidentally
        #    equal counters stay distinct through the key).
        encoding_anomaly_counts(
            batch_df, group_col, text_col
        ).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ).write.mode("append").parquet(counts_dir)

        # 2. Publish the refreshed census from state only: exact
        #    BIGINT sums per group + the same exact-division tail as
        #    the batch operator.
        state = sess.read.parquet(counts_dir).distinct()
        folded = state.groupBy(group_col).agg(
            *[
                F.sum(c).cast("bigint").alias(c)
                for c in ENCODING_ANOMALY_COUNTERS
            ]
        )
        current = encoding_anomaly_from_counts(
            folded, group_col
        ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        current.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(census_dir)

    return apply_batch


def streaming_encoding_anomaly(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    census_dir: str,
    group_col: str,
    text_col: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving document batch's
    damage counters into the state and publish the refreshed
    per-group census into its ``batch_id`` partition of
    ``census_dir``.  Returns a ``DataStreamWriter`` — caller
    ``.start()``s it."""
    apply_batch = encoding_census_batch_folder(
        state_dir, census_dir, group_col, text_col
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
