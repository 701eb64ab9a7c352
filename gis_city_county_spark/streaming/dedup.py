"""Streaming near-duplicate detection: stateful LSH over a document
stream.

The batch near-dup pipeline (``operators.dedup``: shingle → MinHash →
banded LSH → bucket self-join) assumes the whole corpus is present.
An ingestion pipeline wants the ONLINE form: as documents arrive,
which earlier documents is each one a near-dup candidate of?  That is
a custom stateful operator — exactly the
``applyInPandasWithState`` escape hatch:

* the signature/band computation uses
  :func:`operators.dedup.minhash_bands_rowlocal` — pure per-row
  projections (streaming-legal; bit-identical band hashes to the
  batch chain, pinned by ``tests/test_streaming.py``);
* state is keyed by ``(band_idx, band_hash)`` — the LSH bucket — and
  holds the ids seen in that bucket so far, so each arriving document
  pairs ONLY against its bucket-mates, never the whole history (the
  same no-all-pairs property as the batch bucket join, carried over
  to the stream);
* every unordered candidate pair is emitted exactly once: when its
  later member arrives (intra-batch arrivals are ordered by id).

Scale: state shards by bucket hash across executors; per-bucket state
is a bounded id list in well-behaved corpora, and a hot bucket
(boilerplate text) should be capped exactly like the batch path's
``max_bucket`` — pass ``max_state`` to stop growing (and stop
emitting from) pathological buckets.  A capped bucket keeps absorbing
arrivals silently, so one boilerplate cluster can never stall or
bloat the stream.  Eviction: pass ``state_ttl_ms`` to drop buckets
idle longer than the TTL (processing-time timeout) — the streaming
analogue of a watermark on bucket inactivity; total state is then
bounded by (active buckets in the TTL horizon) × ``max_state`` ids
instead of growing with stream length.

Run-to-completion equivalence with the batch pipeline
(``lsh_candidate_pairs``) is asserted in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException

from gis_city_county_spark.operators.dedup import minhash_bands_rowlocal


def streaming_near_dup_pairs(
    spark,
    schema,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_state: int | None = None,
    state_ttl_ms: int | None = None,
    reader_options: dict | None = None,
):
    """Stream of documents → append-mode stream of candidate pairs
    ``(a_id, b_id, band_idx, band_hash)`` with ``a_id < b_id``; a pair
    appears once per band collision (distinct-aggregate downstream if
    pair-level counts are wanted, mirroring batch
    ``lsh_candidate_pairs``).

    ``reader_options`` go to the file-source *read* (e.g.
    ``{"maxFilesPerTrigger": 1}`` to bound micro-batch size — it is a
    source option, a no-op on the sink).  ``state_ttl_ms`` evicts
    buckets idle longer than the TTL."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("a_id", T.LongType()),
            T.StructField("b_id", T.LongType()),
            T.StructField("band_idx", T.IntegerType()),
            T.StructField("band_hash", T.StringType()),
        ]
    )
    # ids are kept comma-joined in one string cell: state schemas are
    # Arrow-encoded tuples and a flat string survives every Spark
    # version's state codec.
    state_schema = T.StructType([T.StructField("ids", T.StringType())])

    def update(key, pdfs, state: GroupState):
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        prev: list[int] = []
        if state.exists:
            raw = state.get[0]
            prev = [int(x) for x in raw.split(",")] if raw else []
        capped = max_state is not None and len(prev) >= max_state
        a_ids: list[int] = []
        b_ids: list[int] = []
        arrivals: list[int] = []
        for pdf in pdfs:
            arrivals.extend(int(v) for v in pdf[id_col])
        for i in sorted(arrivals):
            if not capped:
                for p in prev:
                    a_ids.append(min(i, p))
                    b_ids.append(max(i, p))
            prev.append(i)
            if max_state is not None and len(prev) >= max_state:
                capped = True
        if max_state is not None:
            prev = prev[:max_state]
        state.update((",".join(str(x) for x in prev),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if a_ids:
            yield pd.DataFrame(
                {
                    "a_id": a_ids,
                    "b_id": b_ids,
                    "band_idx": [key[0]] * len(a_ids),
                    "band_hash": [key[1]] * len(a_ids),
                }
            )

    reader = spark.readStream.schema(schema)
    for opt, val in (reader_options or {}).items():
        reader = reader.option(opt, val)
    stream = reader.parquet(path)
    bands_df = minhash_bands_rowlocal(
        stream, id_col, text_col, k=k, num_hashes=num_hashes, bands=bands
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return bands_df.groupBy("band_idx", "band_hash").applyInPandasWithState(
        update, out_schema, state_schema, "Append", timeout
    )


def streaming_incremental_dedup(
    spark,
    schema,
    incoming_path: str,
    base_dir: str,
    report_dir: str,
    id_col: str,
    text_col: str,
    group_col: str,
    max_files_per_trigger: int = 1,
):
    """Streaming twin of
    :func:`operators.dedup.incremental_dedup_report`: each arriving
    micro-batch of documents runs the SAME fingerprint anti-join
    funnel against the fingerprint base accumulated from every
    earlier batch, appends its per-group funnel report (tagged with
    ``batch_id``), and folds its newly-ingested fingerprints into the
    base — the continuous form of the nightly feed-drop audit, via
    ``foreachBatch``.

    State is the slim on-disk fingerprint table (one distinct string
    column under ``base_dir``), NOT the corpus: per batch the work is
    one anti-join of the batch against it, identical to the batch
    operator — so per-(batch, group) funnel counts are BIT-EQUAL to
    replaying the batches sequentially through
    ``incremental_dedup_report`` (asserted in
    ``tests/test_streaming.py``).  The ingested-fingerprint append is
    the only state write; a replayed batch re-reports but re-ingests
    nothing (its fingerprints are already in the base), the same
    idempotence as the CDC apply twin.

    Returns a ``DataStreamWriter`` — caller ``.start()``s it.
    """
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.dedup import (
        incremental_dedup_report_from_fps,
    )
    from gis_city_county_spark.operators.textstats import fingerprint_md5

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession
        try:
            base_fp = sess.read.parquet(base_dir)
        except AnalysisException as exc:
            # Only a missing base means "first batch".  Any other
            # analysis failure (corrupt footer, partial write) must
            # fail the stream loudly — silently treating it as empty
            # would re-ingest duplicate fingerprints and misreport
            # n_dup_vs_base for the batch.
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            base_fp = sess.createDataFrame([], "__fp string")
        report = incremental_dedup_report_from_fps(
            base_fp, batch_df, id_col, text_col, group_col
        ).withColumn("batch_id", F.lit(batch_id))
        report.write.mode("append").parquet(report_dir)
        inc_fp = batch_df.select(
            fingerprint_md5(text_col).alias("__fp")
        ).distinct()
        new_fps = inc_fp.join(base_fp, "__fp", "left_anti")
        new_fps.write.mode("append").parquet(base_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
