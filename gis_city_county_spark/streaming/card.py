"""Streaming twin of the publishable dataset card.

``operators.corpus.dataset_card`` is the one-row corpus summary a
batch build publishes next to the data.  The streaming form maintains
that SAME card incrementally as document batches arrive — the card a
continuously-ingesting corpus keeps current instead of recomputing
from scratch (at 100 TB a full recompute per feed drop is the cost
being avoided; the incremental state is three slim tables, none of
them the corpus).

State layout (all parquet, all append-only, all replay-idempotent):

* ``fp_dir``    — the distinct fingerprint base (one string column),
  the same slim state as the incremental-dedup funnel: per batch one
  anti-join decides which fingerprints are new.
* ``dims_dir``  — distinct (kind, val) provenance values seen so far
  (kind ∈ {lang, source}); anti-join append, bounded by the true
  lang/source cardinality, never the corpus.
* ``totals_dir`` — one row of map-combinable scalar measures PER
  BATCH, keyed by ``batch_id``.  A replayed batch appends an
  IDENTICAL row, and the card reads the totals through DISTINCT, so
  replays are no-ops end to end.

After folding a batch in, the current card (bit-equal to running
``dataset_card`` over every document that has arrived — integer sums
are associative, the two ppm/mean derivations are single exact-int
divisions) is published to ``card_dir`` partitioned by batch id with
dynamic partition overwrite, so a retried batch REPLACES its own card
partition instead of appending a duplicate row — the publish step is
replay-idempotent end to end, like the state folds.  Equivalence is
asserted batch-by-batch in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import functions as F


def _scalar_measures(df, text_col: str):
    """The five map-combinable measures of ``dataset_card`` (same
    expressions as ``operators/corpus.py:dataset_card``; duplicated
    rather than shared so the driver-checked batch plan stays
    byte-identical — the bit-equality test pins the two in sync)."""
    from gis_city_county_spark.operators.textstats import (
        bpe_token_count,
        quality_score,
        token_count,
    )

    return [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length(text_col)).cast("bigint").alias("total_chars"),
        F.sum(token_count(text_col)).cast("bigint").alias("total_words"),
        F.sum(bpe_token_count(text_col)).cast("bigint").alias("total_subwords"),
        F.sum(
            F.floor(quality_score(text_col) * F.lit(1000.0)).cast("bigint")
        ).cast("bigint").alias("q_milli_sum"),
    ]


def _read_or_empty(sess, path: str, schema: str):
    try:
        return sess.read.parquet(path)
    except AnalysisException as exc:
        # Missing state means "nothing arrived yet"; any other read
        # failure (corrupt/partial write) must fail the stream loudly.
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        return sess.createDataFrame([], schema)


def card_batch_folder(
    state_dir: str,
    card_dir: str,
    text_col: str,
    lang_col: str,
    source_col: str,
):
    """The foreachBatch fold of :func:`streaming_dataset_card`,
    exposed as a plain ``(batch_df, batch_id)`` callable so the retry
    path is directly testable: calling it TWICE with the same batch
    (a foreachBatch retry) must leave state and the published card
    partition exactly as one call does."""
    from gis_city_county_spark.operators.textstats import fingerprint_md5

    fp_dir = f"{state_dir}/fp"
    dims_dir = f"{state_dir}/dims"
    totals_dir = f"{state_dir}/totals"

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession

        # 1. Fold the batch's NEW fingerprints into the base.
        base_fp = _read_or_empty(sess, fp_dir, "__fp string")
        inc_fp = batch_df.select(
            fingerprint_md5(text_col).alias("__fp")
        ).distinct()
        inc_fp.join(base_fp, "__fp", "left_anti").write.mode(
            "append"
        ).parquet(fp_dir)

        # 2. Fold new provenance values (non-NULL, matching the
        #    countDistinct semantics of the batch card).
        base_dims = _read_or_empty(sess, dims_dir, "kind string, val string")
        inc_dims = (
            batch_df.select(F.lit("lang").alias("kind"),
                            F.col(lang_col).cast("string").alias("val"))
            .unionByName(
                batch_df.select(F.lit("source").alias("kind"),
                                F.col(source_col).cast("string").alias("val"))
            )
            .filter(F.col("val").isNotNull())
            .distinct()
        )
        inc_dims.join(base_dims, ["kind", "val"], "left_anti").write.mode(
            "append"
        ).parquet(dims_dir)

        # 3. Append this batch's scalar measures, keyed by batch_id
        #    (a replay appends an identical row; reads are DISTINCT).
        batch_df.agg(*_scalar_measures(batch_df, text_col)).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ).write.mode("append").parquet(totals_dir)

        # 4. Publish the refreshed card from state only.
        totals = sess.read.parquet(totals_dir).distinct()
        scalars = totals.agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_chars").cast("bigint").alias("total_chars"),
            F.sum("total_words").cast("bigint").alias("total_words"),
            F.sum("total_subwords").cast("bigint").alias("total_subwords"),
            F.sum("q_milli_sum").cast("bigint").alias("__q_milli_sum"),
        )
        dims = sess.read.parquet(dims_dir)
        dim_counts = dims.groupBy().agg(
            # coalesce: SUM over an empty dims table (an all-NULL
            # provenance batch) is NULL, but the batch card's
            # countDistinct reports 0 there.
            F.coalesce(
                F.sum(F.when(F.col("kind") == "lang", 1).otherwise(0)),
                F.lit(0),
            ).cast("bigint").alias("n_langs"),
            F.coalesce(
                F.sum(F.when(F.col("kind") == "source", 1).otherwise(0)),
                F.lit(0),
            ).cast("bigint").alias("n_sources"),
        )
        n_fp = sess.read.parquet(fp_dir).groupBy().agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_fp")
        )
        card = (
            scalars.crossJoin(dim_counts)  # three 1-row frames
            .crossJoin(n_fp)
            .select(
                "n_docs",
                "n_langs",
                "n_sources",
                "total_chars",
                "total_words",
                "total_subwords",
                "n_distinct_fp",
                F.expr(
                    "((n_docs - n_distinct_fp) * CAST(1000000 AS BIGINT))"
                    " div n_docs"
                ).alias("exact_dup_ppm"),
                (
                    F.col("__q_milli_sum").cast("double")
                    / F.col("n_docs").cast("double")
                ).alias("mean_quality_milli"),
                F.lit(batch_id).cast("bigint").alias("batch_id"),
            )
        )
        # Partition-overwrite by batch_id: a foreachBatch RETRY of the
        # same batch republishes into its own partition instead of
        # appending a duplicate row, so the publish step is as
        # replay-idempotent as the state folds (the retried card row
        # is identical — state folds are anti-join/DISTINCT — but
        # append would still double it on disk).
        card.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(card_dir)

    return apply_batch


def streaming_dataset_card(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    card_dir: str,
    id_col: str,
    text_col: str,
    lang_col: str,
    source_col: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving document batch into the
    card state and publish the refreshed one-row card into its
    ``batch_id`` partition of ``card_dir`` (partition overwrite — a
    retried batch replaces, never duplicates).  Returns a
    ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = card_batch_folder(
        state_dir, card_dir, text_col, lang_col, source_col
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
