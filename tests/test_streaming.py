"""Structured Streaming operators vs. their batch twins.

Each streaming query runs with an ``availableNow`` trigger over a
parquet snapshot of the events table and lands in a memory sink; the
batch form of the same logic is the oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.streaming.events import (
    sessionize,
    stateful_user_totals,
    streaming_dedup,
    streaming_hopping_window_agg,
    streaming_sessionize,
    streaming_windowed_agg,
)


@pytest.fixture(scope="module")
def events_snapshot(spark, sf_dir, tmp_path_factory):
    """Events subset re-written as plain-TIMESTAMP parquet (the raw
    table stores TIMESTAMP(NANOS), which readStream can't infer)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    ev.write.parquet(path)
    return path, spark.read.parquet(path).schema


def _run_to_memory(stream_df, name: str, mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_windowed_agg_matches_batch(spark, events_snapshot):
    path, schema = events_snapshot
    # Append mode would hold back windows the final watermark hasn't
    # closed (they'd emit on the next trigger of a live stream);
    # complete mode shows the full state for a like-for-like check.
    _run_to_memory(
        streaming_windowed_agg(spark, schema, path, "1 hour"), "win_agg", "complete"
    )
    got = {
        (r["win"]["start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    raw = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    want = {(r["win"]["start"], r["event_type"]): r["n_events"] for r in raw.collect()}
    assert got == want
    assert len(got) > 0


def test_streaming_hopping_window_matches_batch(spark, events_snapshot):
    path, schema = events_snapshot
    _run_to_memory(
        streaming_hopping_window_agg(spark, schema, path, "15 minutes", "5 minutes"),
        "hop_agg",
        "complete",
    )
    got = {
        (r["win"]["start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM hop_agg").collect()
    }
    raw = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "15 minutes", "5 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    want = {(r["win"]["start"], r["event_type"]): r["n_events"] for r in raw.collect()}
    assert got == want
    assert len(got) > 0


def test_streaming_enrich_stream_static_matches_batch(spark, sf_dir, events_snapshot):
    from gis_city_county_spark.streaming.events import streaming_enrich

    path, schema = events_snapshot
    dim = load_table(spark, sf_dir, "customer")
    _run_to_memory(
        streaming_enrich(spark, schema, path, dim), "enriched", "complete"
    )
    got = {
        r["segment"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    batch = (
        spark.read.parquet(path)
        .join(
            dim.selectExpr("c_custkey AS user_id", "c_mktsegment AS segment"),
            "user_id",
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
    )
    want = {r["segment"]: (r["n"], r["tv"]) for r in batch.collect()}
    assert set(got) == set(want) and len(got) > 0
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


def test_streaming_sessionize_matches_batch_counts(spark, events_snapshot):
    path, schema = events_snapshot
    _run_to_memory(
        streaming_sessionize(spark, schema, path, gap="30 minutes"), "sess", "complete"
    )
    stream_sessions = spark.sql(
        "SELECT user_id, COUNT(*) AS n_sessions, SUM(n_events) AS n_events "
        "FROM sess GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in stream_sessions}

    batch = sessionize(spark.read.parquet(path), gap_seconds=1800)
    want_rows = (
        batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    )
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in want_rows}
    assert got == want


def test_streaming_dedup_matches_batch_keys(spark, events_snapshot):
    path, schema = events_snapshot
    _run_to_memory(
        streaming_dedup(spark, schema, path, keys=("user_id", "event_type")),
        "dedup",
        "append",
    )
    rows = spark.sql("SELECT user_id, event_type FROM dedup").collect()
    got = [(r["user_id"], r["event_type"]) for r in rows]
    # exactly one surviving row per distinct key
    assert len(got) == len(set(got))
    want = {
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(path).select("user_id", "event_type").distinct().collect()
    }
    assert set(got) == want


def test_stateful_user_totals(spark, events_snapshot):
    path, schema = events_snapshot
    _run_to_memory(stateful_user_totals(spark, schema, path), "totals", "update")
    # Update mode can emit a row per key per micro-batch; the final
    # (max n_events) row per key is the lifetime total.
    got = {
        r["user_id"]: r["n_events"]
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n_events FROM totals GROUP BY user_id"
        ).collect()
    }
    want = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_interval_join_matches_batch_range_join(spark, events_snapshot):
    from gis_city_county_spark.operators.temporal import range_join
    from gis_city_county_spark.streaming.events import streaming_interval_join

    path, schema = events_snapshot
    _run_to_memory(
        streaming_interval_join(spark, schema, path), "interval_join", "append"
    )
    got = {
        (r.err_id, r.click_id)
        for r in spark.sql("SELECT err_id, click_id FROM interval_join").collect()
    }
    ev = spark.read.parquet(path)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    pairs = range_join(errors, clicks, ["user_id"], "ts", "ts", -600.0, 0.0)
    want = {(r.event_id, r.event_id_r) for r in pairs.collect()}
    assert got == want
    assert len(want) > 0


def test_streaming_cdc_apply_matches_sequential_batch(spark, tmp_path):
    import os
    import time

    from gis_city_county_spark.operators.cdc import merge_upsert
    from gis_city_county_spark.sources.files import publish_snapshot, read_published
    from gis_city_county_spark.streaming.events import streaming_cdc_apply

    pub = str(tmp_path / "pub")
    base = spark.createDataFrame(
        [(k, float(k * 10)) for k in range(1, 6)], "k long, val double"
    )
    publish_snapshot(base, pub, "snap")

    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    batch1 = spark.createDataFrame(
        [(3, 30.5, "U", 1), (6, 6.0, "I", 2)], "k long, val double, op string, seq long"
    )
    batch2 = spark.createDataFrame(
        # Two changes for the same key inside one file: only seq=4 may win.
        [(1, 0.0, "D", 3), (6, 66.0, "U", 4), (6, -1.0, "U", 0)],
        "k long, val double, op string, seq long",
    )
    # The file stream source lists plain files under the watched dir
    # (no recursion), so stage each change batch and move its part
    # file in flat, with distinct mtimes so c1's batch triggers first.
    import glob
    import shutil

    stage = tmp_path / "stage"
    now = time.time()
    for i, (batch, offs) in enumerate(((batch1, 60), (batch2, 30)), start=1):
        staged = str(stage / f"c{i}")
        batch.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(changes_dir / f"c{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - offs, now - offs))

    schema = batch1.schema
    q = streaming_cdc_apply(
        spark, schema, str(changes_dir), pub, "snap", ("k",), "seq"
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {(r.k, r.val) for r in read_published(spark, pub, "snap").collect()}

    state = base
    for ch in (batch1, batch2):
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy(F.col("seq").desc())
        latest = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "seq")
        )
        state = merge_upsert(state, latest, ["k"])
    want = {(r.k, r.val) for r in state.collect()}
    assert got == want
    assert got == {(2, 20.0), (3, 30.5), (4, 40.0), (5, 50.0), (6, 66.0)}


def test_stateful_user_totals_tws_matches_batch(spark, events_snapshot):
    """transformWithStateInPandas batch-twin equivalence.

    SKIP CONDITION (environment, not dead coverage): the TWS driver
    worker ships state-schema protos through ``google.protobuf``,
    which is not installed in every container this suite runs in
    (import-gated per brief — no pip installs).  Where protobuf IS
    present the test runs fully; the stateful-processor code path has
    no other coverage, so the ``-rs`` reason makes the gap visible
    rather than silent.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState needs it")

    from gis_city_county_spark.streaming.events import stateful_user_totals_tws

    path, schema = events_snapshot
    # transformWithState requires the RocksDB state store provider.
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _run_to_memory(
            stateful_user_totals_tws(spark, schema, path), "totals_tws", "update"
        )
        got = {
            r["user_id"]: r["n_events"]
            for r in spark.sql(
                "SELECT user_id, MAX(n_events) AS n_events FROM totals_tws GROUP BY user_id"
            ).collect()
        }
        want = {
            r["user_id"]: r["n"]
            for r in spark.read.parquet(path)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_checkpoint_restart_exactly_once(spark, events_snapshot, tmp_path):
    """Checkpoint recovery: a restarted query resumes from the commit
    log and processes ONLY files that arrived after the first run —
    no reprocessing, no duplicates in the downstream parquet sink."""
    import os

    path, schema = events_snapshot
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    full = spark.read.parquet(path)
    n_total = full.count()
    first, second = full.filter(F.col("event_id") % 2 == 0), full.filter(
        F.col("event_id") % 2 == 1
    )
    first.write.parquet(src_dir + "/batch1")

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == first.count()

    second.write.parquet(src_dir + "/batch2")
    run_once()
    out = spark.read.parquet(out_dir)
    assert out.count() == n_total  # second run added ONLY the new files
    assert out.select("event_id").distinct().count() == n_total  # no dupes


# --------------------- r3: streaming near-dup (stateful LSH buckets)


@pytest.fixture(scope="module")
def docs_stream_snapshot(spark, sf_dir, tmp_path_factory):
    """Documents subset written as TWO parquet files so the file
    source (maxFilesPerTrigger=1) delivers two ordered micro-batches —
    candidate pairs must then span batches through GroupState."""
    root = tmp_path_factory.mktemp("stream") / "docs"
    path = str(root)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    early = docs.filter(F.col("doc_id") % 2 == 0)
    late = docs.filter(F.col("doc_id") % 2 == 1)
    early.coalesce(1).write.parquet(path)
    late.coalesce(1).write.mode("append").parquet(path)
    return path, spark.read.parquet(path).schema


def test_rowlocal_bands_match_relational_chain(spark, sf_dir):
    """The streaming-safe per-row MinHash banding must produce
    bit-identical (id, band_idx, band_hash) rows to the batch
    shingle → signature → bands chain."""
    from gis_city_county_spark.operators.dedup import (
        lsh_bands,
        minhash_bands_rowlocal,
        minhash_signatures,
        shingle_df,
    )

    docs = load_table(spark, sf_dir, "documents")
    rel = lsh_bands(
        minhash_signatures(shingle_df(docs, "doc_id", "text", 3), "doc_id", 16),
        "doc_id", 16, 4,
    )
    row = minhash_bands_rowlocal(docs, "doc_id", "text", 3, 16, 4)
    assert {tuple(r) for r in rel.collect()} == {tuple(r) for r in row.collect()}


def test_streaming_near_dup_pairs_match_batch_lsh(spark, docs_stream_snapshot):
    """Run-to-completion equivalence: the stateful streaming LSH must
    produce exactly the batch pipeline's candidate pairs (each with
    its per-pair band-collision count), regardless of which micro-
    batch each document arrived in."""
    from gis_city_county_spark.operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_df,
    )
    from gis_city_county_spark.streaming.dedup import streaming_near_dup_pairs

    path, schema = docs_stream_snapshot
    # maxFilesPerTrigger is a file-SOURCE option: it must reach the
    # readStream (a writeStream .option is silently ignored), so the
    # two snapshot files genuinely arrive in separate micro-batches
    # and pairs must cross GroupState.
    stream_df = streaming_near_dup_pairs(
        spark, schema, path, reader_options={"maxFilesPerTrigger": 1}
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("near_dup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    data_batches = [
        p for p in q.recentProgress if p["numInputRows"] > 0
    ]
    assert len(data_batches) >= 2, (
        "expected the two snapshot files in separate micro-batches; "
        f"got {len(data_batches)} data batches"
    )
    got = {
        (r["a_id"], r["b_id"], r["n_bands"])
        for r in spark.sql(
            "SELECT a_id, b_id, COUNT(DISTINCT band_idx) AS n_bands"
            " FROM near_dup GROUP BY a_id, b_id"
        ).collect()
    }
    docs = spark.read.parquet(path)
    batch = lsh_candidate_pairs(
        lsh_bands(
            minhash_signatures(shingle_df(docs, "doc_id", "text", 3), "doc_id", 16),
            "doc_id", 16, 4,
        ),
        "doc_id",
    )
    cols = [c for c in batch.columns]
    nb = "n_bands" if "n_bands" in cols else cols[2]
    want = {(r["a_id"], r["b_id"], r[nb]) for r in batch.collect()}
    assert got == want
    assert len(got) > 0


def test_streaming_near_dup_hot_bucket_cap(spark, tmp_path):
    """A bucket past ``max_state`` must stop emitting pairs WITHOUT
    stalling the stream: the query still completes, the capped bucket
    emits only the pairs formed before the cap, and cold buckets are
    untouched."""
    from gis_city_county_spark.streaming.dedup import streaming_near_dup_pairs

    # 6 identical docs (one pathological LSH bucket per band) + 2
    # distinct near-dup docs that share their own buckets.
    hot = [(i, "common boilerplate text repeated everywhere") for i in range(6)]
    cold = [
        (100, "a genuinely unique document about tidal marshes"),
        (101, "a genuinely unique document about tidal marshes!"),
    ]
    path = str(tmp_path / "docs")
    df = spark.createDataFrame(hot + cold, "doc_id long, text string")
    df.coalesce(1).write.parquet(path)
    schema = spark.read.parquet(path).schema

    cap = 3
    stream_df = streaming_near_dup_pairs(spark, schema, path, max_state=cap)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("near_dup_capped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM near_dup_capped").collect()
    hot_ids = {r[0] for r in hot}
    # Capped bucket: ids arrive in sorted order, pairing stops once the
    # bucket holds `cap` ids → per band exactly C(cap,2)=3 pairs among
    # the first `cap` hot ids, never any pair touching a later id.
    hot_pairs = {(r["a_id"], r["b_id"]) for r in rows if r["a_id"] in hot_ids}
    assert hot_pairs == {(0, 1), (0, 2), (1, 2)}
    # Cold bucket keeps emitting normally if the two docs collide in
    # any band; at minimum the stream ran to completion with the hot
    # bucket silenced rather than stalled.
    assert q.lastProgress is not None

    # TTL variant: the ProcessingTimeTimeout registration path must not
    # change run-to-completion output (eviction itself only fires on a
    # later trigger after the TTL lapses — unobservable under
    # availableNow; the branch is exercised, the results identical).
    ttl_df = streaming_near_dup_pairs(
        spark, schema, path, max_state=cap, state_ttl_ms=60_000
    )
    q2 = (
        ttl_df.writeStream.format("memory")
        .queryName("near_dup_ttl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    ttl_rows = spark.sql("SELECT * FROM near_dup_ttl").collect()
    assert {tuple(r) for r in ttl_rows} == {tuple(r) for r in rows}


def test_streaming_countmin_cells_match_batch(spark, sf_dir, tmp_path):
    """The streaming count-min counters must be BIT-equal to the batch
    sketch cells after run-to-completion — same md5 bucket hashing,
    same aggregation, state bounded at depth x width regardless of key
    cardinality."""
    from gis_city_county_spark.operators.sketch import countmin_cells
    from gis_city_county_spark.streaming.sketch import streaming_countmin_cells
    from gis_city_county_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")
    # two files so the counters genuinely accumulate across micro-batches
    path = str(tmp_path / "ev")
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(path)
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(path)
    schema = spark.read.parquet(path).schema

    width, depth = 1 << 8, 4
    cells = streaming_countmin_cells(
        spark, schema, path, "user_id", width, depth,
        reader_options={"maxFilesPerTrigger": 1},
    )
    q = (
        cells.writeStream.format("memory")
        .queryName("cm_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["__d"], r["__b"]): r["__cell"]
        for r in spark.sql("SELECT * FROM cm_cells").collect()
    }
    batch = countmin_cells(
        spark.read.parquet(path).select(F.col("user_id").cast("string").alias("__k")),
        "__k", width, depth,
    )
    want = {(r["__d"], r["__b"]): r["__cell"] for r in batch.collect()}
    assert got == want
    assert len(got) > 0
    # the sketch stayed bounded
    assert len(got) <= depth * width


def test_streaming_monitor_reports_throughput_and_bounded_state(spark, tmp_path):
    """The progress reducer must surface per-batch throughput and the
    state-store row count, and the count-min twin's state must respect
    its designed depth x width bound."""
    from gis_city_county_spark.streaming.monitor import batch_reports, summarize
    from gis_city_county_spark.streaming.sketch import streaming_countmin_cells

    path = str(tmp_path / "docs")
    df = spark.range(0, 400).selectExpr("id AS user_id")
    df.filter("user_id % 2 = 0").coalesce(1).write.parquet(path)
    df.filter("user_id % 2 = 1").coalesce(1).write.mode("append").parquet(path)
    schema = spark.read.parquet(path).schema

    width, depth = 1 << 6, 4
    cells = streaming_countmin_cells(
        spark, schema, path, "user_id", width, depth,
        reader_options={"maxFilesPerTrigger": 1},
    )
    q = (
        cells.writeStream.format("memory")
        .queryName("cm_mon")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    reports = batch_reports(q)
    s = summarize(q)
    assert s["n_data_batches"] >= 2
    assert s["total_input_rows"] == 400
    data = [r for r in reports if r["input_rows"]]
    assert all(r["rows_per_sec"] and r["rows_per_sec"] > 0 for r in data)
    # boundedness: streaming-agg state is the sketch itself
    assert 0 < s["final_state_rows"] <= depth * width


def test_streaming_near_dup_state_bound_via_monitor(spark, tmp_path):
    """Operational proof of the LSH dedup scale story: GroupState rows
    never exceed active buckets (= distinct (band_idx, band_hash)
    groups), the bound SCALE.md claims."""
    from gis_city_county_spark.streaming.dedup import streaming_near_dup_pairs
    from gis_city_county_spark.streaming.monitor import summarize

    docs = [(i, f"document number {i} about topic {i % 7} with words")
            for i in range(40)]
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1)\
        .write.parquet(path)
    schema = spark.read.parquet(path).schema

    stream_df = streaming_near_dup_pairs(spark, schema, path, max_state=8)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("nd_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    s = summarize(q)
    # one state row per active bucket; 40 docs x 4 bands bounds the
    # distinct buckets at 160
    assert 0 < s["final_state_rows"] <= 160
    assert s["total_input_rows"] == 40


def test_streaming_near_dup_recovers_state_from_checkpoint(spark, sf_dir, tmp_path):
    """Crash recovery for the stateful LSH dedup: stop the query after
    the first micro-batch, start a NEW query from the same checkpoint
    with more files present, and the final pair set must equal the
    uninterrupted batch pipeline's — cross-restart pairs exist only if
    the bucket GroupState was genuinely restored from the state store,
    not recomputed from scratch."""
    import os

    from gis_city_county_spark.operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_df,
    )
    from gis_city_county_spark.streaming.dedup import streaming_near_dup_pairs

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    early = docs.filter(F.col("doc_id") % 2 == 0)
    late = docs.filter(F.col("doc_id") % 2 == 1)
    early.coalesce(1).write.parquet(src + "/batch1")
    schema = (
        spark.read.option("recursiveFileLookup", "true").parquet(src).schema
    )

    def run_once():
        q = (
            streaming_near_dup_pairs(
                spark, schema, src,
                reader_options={
                    "maxFilesPerTrigger": 1,
                    "recursiveFileLookup": "true",
                },
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # first life: only the early docs exist
    n_first = spark.read.parquet(out).count()

    late.coalesce(1).write.parquet(src + "/batch2")
    run_once()  # second life: new query object, same checkpoint

    got = {
        (r["a_id"], r["b_id"], r["n_bands"])
        for r in spark.read.parquet(out)
        .groupBy("a_id", "b_id")
        .agg(F.countDistinct("band_idx").alias("n_bands"))
        .collect()
    }
    batch = lsh_candidate_pairs(
        lsh_bands(
            minhash_signatures(
                shingle_df(
                    spark.read.option("recursiveFileLookup", "true").parquet(src),
                    "doc_id", "text", 3,
                ),
                "doc_id", 16,
            ),
            "doc_id", 16, 4,
        ),
        "doc_id",
    )
    nb = "n_bands" if "n_bands" in batch.columns else batch.columns[2]
    want = {(r["a_id"], r["b_id"], r[nb]) for r in batch.collect()}
    assert got == want
    # the restart must have CONTRIBUTED pairs (early-late cross pairs
    # emitted by the recovered state), not just replayed the first run
    cross = [(a, b) for a, b, _ in got if (a % 2) != (b % 2)]
    assert cross, "no cross-restart pairs — state was not recovered"
    assert spark.read.parquet(out).count() > n_first


def test_streaming_hll_registers_match_batch(spark, sf_dir, tmp_path):
    """The streaming HLL registers must be BIT-equal to the batch
    build after run-to-completion (same md5 hash, same rho), state
    bounded at groups x 2^p, and the estimate roll-up applied to the
    final streaming snapshot must equal the batch hll_distinct row."""
    from gis_city_county_spark.operators.sketch import (
        hll_distinct,
        hll_estimate_from_registers,
    )
    from gis_city_county_spark.sources.tables import load_table
    from gis_city_county_spark.streaming.sketch import streaming_hll_registers

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    path = str(tmp_path / "ev")
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(path)
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(path)
    schema = spark.read.parquet(path).schema

    p = 6
    regs = streaming_hll_registers(
        spark, schema, path, "user_id", group_col="event_type", p=p,
        reader_options={"maxFilesPerTrigger": 1},
    )
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snapshot = spark.sql("SELECT * FROM hll_regs")
    got = {
        (r["event_type"], r["__reg"]): r["__m"] for r in snapshot.collect()
    }
    batch = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("__k")
    )
    from gis_city_county_spark.operators.sketch import hll_registers

    want = {
        (r["event_type"], r["__reg"]): r["__m"]
        for r in hll_registers(batch, ["event_type"], "__k", p).collect()
    }
    assert got == want and len(got) > 0
    n_groups = len({g for g, _ in got})
    assert len(got) <= n_groups * (1 << p)  # bounded state

    est_stream = {
        r["event_type"]: (r["register_sum"], r["hll_raw_est"])
        for r in hll_estimate_from_registers(
            snapshot, ["event_type"], p
        ).collect()
    }
    est_batch = {
        r["event_type"]: (r["register_sum"], r["hll_raw_est"])
        for r in hll_distinct(batch, ["event_type"], "__k", p).collect()
    }
    assert est_stream == est_batch


def test_streaming_incremental_dedup_matches_sequential_batch(spark, tmp_path):
    """Three ordered arrival batches through the foreachBatch funnel
    produce per-(batch, group) counts bit-equal to replaying the same
    batches sequentially through the batch operator with an
    accumulated base — including a NULL-group batch (the null-safe
    join) and a cross-batch duplicate (ingested once, then a base-dup
    forever)."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.dedup import incremental_dedup_report
    from gis_city_county_spark.streaming.dedup import (
        streaming_incremental_dedup,
    )

    seed = spark.createDataFrame(
        [(0, "seed document", "s")], "id long, body string, src string"
    )
    batches = [
        spark.createDataFrame(
            [(1, "alpha text", "a"), (2, "alpha text", "a"),
             (3, "seed document", "b")],
            "id long, body string, src string",
        ),
        spark.createDataFrame(
            # cross-batch dup of batch 1's "alpha text" + a NULL group
            [(4, "alpha text", "a"), (5, "beta text", None)],
            "id long, body string, src string",
        ),
        spark.createDataFrame(
            [(6, "beta text", None), (7, "gamma text", "a")],
            "id long, body string, src string",
        ),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    base_dir = str(tmp_path / "base_fp")
    report_dir = str(tmp_path / "reports")
    # Seed the fingerprint base from the seed corpus (what a nightly
    # build persists): fingerprints of the seed docs.
    from gis_city_county_spark.operators.textstats import fingerprint_md5

    seed.select(fingerprint_md5("body").alias("__fp")).distinct().write.parquet(
        base_dir
    )

    q = (
        streaming_incremental_dedup(
            spark, batches[0].schema, str(incoming), base_dir, report_dir,
            "id", "body", "src",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["batch_id"], r["src"]): (
            r["n_incoming"], r["n_dup_vs_base"], r["n_dup_in_batch"],
            r["n_ingested"],
        )
        for r in spark.read.parquet(report_dir).collect()
    }

    # Sequential batch replay: base grows by each batch's KEPT docs.
    base_docs = seed
    want = {}
    for bid, b in enumerate(batches):
        rep = incremental_dedup_report(base_docs, b, "id", "body", "src")
        for r in rep.collect():
            want[(bid, r["src"])] = (
                r["n_incoming"], r["n_dup_vs_base"], r["n_dup_in_batch"],
                r["n_ingested"],
            )
        base_docs = base_docs.unionByName(b)

    assert got == want
    # Idempotence of the state: the accumulated fingerprint table holds
    # exactly the distinct corpus fingerprints (seed + ingested).
    n_fp = spark.read.parquet(base_dir).distinct().count()
    assert n_fp == 4  # seed, alpha, beta, gamma — no dup ever re-ingested
    # No duplicate fingerprint rows either: the anti-join append keeps
    # the base table itself distinct, not merely distinct-on-read.
    assert spark.read.parquet(base_dir).count() == 4


def test_streaming_dataset_card_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch card maintainer:
    after each batch the published card row is BIT-EQUAL to running
    the batch ``dataset_card`` over every document arrived so far —
    including a NULL lang (countDistinct parity), a cross-batch exact
    duplicate (fingerprint base), and a new-source batch."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.corpus import dataset_card
    from gis_city_county_spark.streaming.card import streaming_dataset_card

    batches = [
        spark.createDataFrame(
            [(1, "alpha text body", "en", "web"),
             (2, "beta text body!", "en", "web")],
            "id long, body string, lang string, src string",
        ),
        spark.createDataFrame(
            # exact dup of doc 1 + a NULL lang
            [(3, "alpha text body", "en", "web"),
             (4, "gamma doc", None, "books")],
            "id long, body string, lang string, src string",
        ),
        spark.createDataFrame(
            [(5, "delta doc longer body here", "fr", "web")],
            "id long, body string, lang string, src string",
        ),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "card_state")
    card_dir = str(tmp_path / "cards")
    q = (
        streaming_dataset_card(
            spark, batches[0].schema, str(incoming), state_dir, card_dir,
            "id", "body", "lang", "src",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = [
        "n_docs", "n_langs", "n_sources", "total_chars", "total_words",
        "total_subwords", "n_distinct_fp", "exact_dup_ppm",
        "mean_quality_milli",
    ]
    got = {
        r["batch_id"]: tuple(r[c] for c in cols)
        for r in spark.read.parquet(card_dir).collect()
    }
    assert set(got) == {0, 1, 2}

    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        want = tuple(
            dataset_card(acc, "id", "body", "lang", "src").collect()[0][c]
            for c in cols
        )
        assert got[bid] == want, f"batch {bid}: {got[bid]} != {want}"

    # Replay idempotence of the state tables: fingerprints and dims
    # stay distinct on disk (anti-join appends).
    fp = spark.read.parquet(f"{state_dir}/fp")
    assert fp.count() == fp.distinct().count() == 4
    dims = spark.read.parquet(f"{state_dir}/dims")
    assert dims.count() == dims.distinct().count() == 4  # en, fr / web, books


def test_streaming_quality_audit_matches_batch_after_each_batch(
    spark, tmp_path
):
    """Three arrival batches through the foreachBatch audit
    maintainer: after each batch the published audit partition is
    BIT-EQUAL to running the batch ``quality_rule_audit`` over every
    document arrived so far — including a rule-flipping batch (a
    symbol-heavy doc), a new source, and a repeated-token doc."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.corpus import quality_rule_audit
    from gis_city_county_spark.streaming.quality import (
        streaming_quality_rule_audit,
    )

    long_clean = " ".join(f"word{i} the and is" for i in range(10))
    batches = [
        spark.createDataFrame(
            [(1, long_clean, "web"),
             (2, "short doc", "web")],           # fires `short`
            "id long, body string, src string",
        ),
        spark.createDataFrame(
            [(3, "!!! ### $$$ %%% &&&", "web"),  # fires symbol+short
             (4, long_clean, "books")],          # new source
            "id long, body string, src string",
        ),
        spark.createDataFrame(
            [(5, " ".join(["spam"] * 40), "books")],  # repetitive
            "id long, body string, src string",
        ),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "audit_state")
    audit_dir = str(tmp_path / "audits")
    q = (
        streaming_quality_rule_audit(
            spark, batches[0].schema, str(incoming), state_dir, audit_dir,
            "src", "body", min_words=20, max_words=1000,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = [
        "src", "n_docs", "n_short", "n_long", "n_low_stopword",
        "n_symbol_heavy", "n_digit_heavy", "n_repetitive", "n_clean",
        "clean_ppm",
    ]
    published = spark.read.parquet(audit_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in quality_rule_audit(
                acc, "src", "body", min_words=20, max_words=1000
            ).collect()
        )
        assert got == want, f"batch {bid}: {got} != {want}"


def test_streaming_quality_audit_publish_is_retry_idempotent(
    spark, tmp_path
):
    """A foreachBatch retry (same batch, same id, folded twice) leaves
    the counter state distinct-on-read and the published audit
    partition with exactly one row set, identical values."""
    from gis_city_county_spark.streaming.quality import (
        quality_audit_batch_folder,
    )

    state_dir = str(tmp_path / "state")
    audit_dir = str(tmp_path / "audits")
    fold = quality_audit_batch_folder(
        state_dir, audit_dir, "src", "body", min_words=2, max_words=100
    )
    b0 = spark.createDataFrame(
        [(1, "the quick brown fox is here and now", "web"),
         (2, "x", "web")],
        "id long, body string, src string",
    )
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(audit_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(audit_dir).collect())
    assert twice == once
    assert spark.read.parquet(audit_dir).count() == 1  # one src group
    counts = spark.read.parquet(f"{state_dir}/rule_counts")
    assert counts.distinct().count() == 1  # identical retry row collapses


def test_streaming_cumulative_distinct_matches_batch_with_late_data(
    spark, tmp_path
):
    """Three arrival batches through the first-seen folder — including
    an OUT-OF-ORDER batch that delivers an earlier event for a known
    key — and after each batch the published curve partition is
    BIT-EQUAL to the batch operator over every event arrived so far."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import cumulative_distinct
    from gis_city_county_spark.streaming.distinct import (
        streaming_cumulative_distinct,
    )

    batches = [
        spark.createDataFrame(
            [(1, "2024-01-05 10:00:00"), (2, "2024-01-05 11:00:00")],
            "user_id long, ts_s string",
        ),
        spark.createDataFrame(
            [(1, "2024-01-07 09:00:00"),   # returning: not new
             (3, "2024-01-07 10:00:00")],
            "user_id long, ts_s string",
        ),
        spark.createDataFrame(
            # LATE data: user 3's true first event was Jan 2
            [(3, "2024-01-02 08:00:00"), (4, "2024-01-08 12:00:00")],
            "user_id long, ts_s string",
        ),
    ]
    batches = [
        b.select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        for b in batches
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "distinct_state")
    curve_dir = str(tmp_path / "curves")
    q = (
        streaming_cumulative_distinct(
            spark, batches[0].schema, str(incoming), state_dir, curve_dir,
            "user_id", "ts",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    published = spark.read.parquet(curve_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            (r["day"], r["n_new"], r["cum_distinct"])
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            (r["day"], r["n_new"], r["cum_distinct"])
            for r in cumulative_distinct(acc, "user_id", "ts").collect()
        )
        assert got == want, f"batch {bid}: {got} != {want}"
    # the late batch rewrote user 3's first day to Jan 2
    final = {
        r["day"].strftime("%Y-%m-%d"): r["n_new"]
        for r in published.filter(F.col("batch_id") == 2).collect()
    }
    assert final["2024-01-02"] == 1
    assert "2024-01-07" not in final  # user 3 no longer 'new' on Jan 7


def test_streaming_cumulative_distinct_retry_idempotent(spark, tmp_path):
    """Folding the same batch twice (a foreachBatch retry) leaves the
    state min-equivalent and the published partition identical."""
    from gis_city_county_spark.streaming.distinct import (
        distinct_batch_folder,
    )

    state_dir = str(tmp_path / "state")
    curve_dir = str(tmp_path / "curves")
    fold = distinct_batch_folder(state_dir, curve_dir, "user_id", "ts")
    b0 = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00"), (2, "2024-01-06 11:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(curve_dir).collect())
    fold(b0, 0)  # retry
    twice = sorted(tuple(r) for r in spark.read.parquet(curve_dir).collect())
    assert twice == once
    assert spark.read.parquet(curve_dir).count() == 2  # two days, one row each


def test_streaming_card_publish_is_retry_idempotent(spark, tmp_path):
    """A foreachBatch RETRY (same batch_df, same batch_id, run twice)
    must leave the state tables AND the published card exactly as one
    run does — the publish partition-overwrites by batch_id instead of
    appending a duplicate row (round-7 ADVICE)."""
    from gis_city_county_spark.streaming.card import card_batch_folder

    state_dir = str(tmp_path / "state")
    card_dir = str(tmp_path / "cards")
    fold = card_batch_folder(state_dir, card_dir, "body", "lang", "src")

    b0 = spark.createDataFrame(
        [(1, "alpha text body", "en", "web"),
         (2, "beta text body!", "en", "web")],
        "id long, body string, lang string, src string",
    )
    b1 = spark.createDataFrame(
        [(3, "alpha text body", "en", "web"),   # cross-batch exact dup
         (4, "gamma doc", None, "books")],
        "id long, body string, lang string, src string",
    )

    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(card_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(card_dir).collect())
    assert twice == once  # no duplicate card row, identical values
    assert spark.read.parquet(card_dir).count() == 1

    fold(b1, 1)
    fold(b1, 1)  # retry of the second batch too
    cards = spark.read.parquet(card_dir)
    assert cards.count() == 2
    by_batch = {r["batch_id"]: r for r in cards.collect()}
    assert set(by_batch) == {0, 1}
    # state stayed distinct through both retries
    fp = spark.read.parquet(f"{state_dir}/fp")
    assert fp.count() == fp.distinct().count() == 3
    totals = spark.read.parquet(f"{state_dir}/totals")
    # retries appended identical rows; the DISTINCT read collapses them
    assert totals.distinct().count() == 2
    # and the published batch-1 card reflects the full 4-doc corpus
    assert by_batch[1]["n_docs"] == 4
    assert by_batch[1]["n_distinct_fp"] == 3


def test_streaming_countmin_delta_matches_batch_after_each_batch(
    spark, tmp_path
):
    """Three arrival batches through the foreachBatch drift maintainer:
    after each batch the published report partition is BIT-EQUAL to
    running the batch ``countmin_delta`` over (baseline, every row
    arrived so far) — the narrow width forces real bucket collisions
    so the sketch estimates (not just the exact audit) are exercised."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.sketch import countmin_delta
    from gis_city_county_spark.streaming.sketch import (
        streaming_countmin_delta,
    )

    W, D, K = 16, 2, 8
    baseline = spark.createDataFrame(
        [(f"k{i % 6}",) for i in range(30)], "key string"
    )
    base_dir = str(tmp_path / "baseline")
    baseline.write.parquet(base_dir)

    batches = [
        spark.createDataFrame(
            [("k0",), ("k0",), ("k1",)], "key string"      # k0 surges
        ),
        spark.createDataFrame(
            [(f"k{i % 4}",) for i in range(20)], "key string"
        ),
        spark.createDataFrame(
            [("k7",), ("k7",), ("k7",)], "key string"      # brand-new key
        ),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "delta_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_countmin_delta(
            spark, batches[0].schema, str(incoming), base_dir,
            state_dir, report_dir, "key", width=W, depth=D, k=K,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = [
        "key", "exact_a", "exact_b", "exact_delta",
        "est_a", "est_b", "est_delta",
    ]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in countmin_delta(
                baseline, acc, "key", width=W, depth=D, k=K
            ).collect()
        )
        assert got == want, f"batch {bid}: {got} != {want}"
    # the new key's drift is visible in the final report
    final = {
        r["key"]: r for r in published.filter(F.col("batch_id") == 2).collect()
    }
    assert final["k7"]["exact_a"] == 0 and final["k7"]["exact_delta"] == 3


def test_streaming_countmin_delta_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch, same id, folded twice) leaves
    the cell/exact state distinct-on-read and the published report
    partition identical — counts never double."""
    from gis_city_county_spark.streaming.sketch import (
        countmin_delta_batch_folder,
    )

    baseline = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "key string"
    )
    base_dir = str(tmp_path / "baseline")
    baseline.write.parquet(base_dir)

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = countmin_delta_batch_folder(
        base_dir, state_dir, report_dir, "key", width=16, depth=2, k=5
    )
    b0 = spark.createDataFrame([("a",), ("c",), ("c",)], "key string")
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    cells = spark.read.parquet(f"{state_dir}/cells")
    assert cells.count() == 2 * cells.distinct().count()  # exact dup rows
    exact = spark.read.parquet(f"{state_dir}/exact")
    assert exact.distinct().count() == 2  # keys a, c — once each
    # the folded exact_b for 'c' is 2, not 4 (retry didn't double)
    final = {r["key"]: r for r in spark.read.parquet(report_dir).collect()}
    assert final["c"]["exact_b"] == 2 and final["c"]["exact_delta"] == 2
    assert final["a"]["exact_delta"] == -1


def test_streaming_rfm_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch RFM maintainer:
    after each batch the published scores partition is BIT-EQUAL to
    the batch ``rfm_scores`` over every row arrived so far — tiles,
    recency anchor, and the once-floored monetary sum all shift as
    users accumulate events, so a partial-fold bug cannot hide."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import rfm_scores
    from gis_city_county_spark.streaming.rfm import streaming_rfm_scores

    def ev(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        )

    batches = [
        ev([(u, f"2024-01-{3 + u:02d} 10:00:00", 10.0 * u + 0.25)
            for u in range(5)]),
        # user 0 surges in frequency+value; user 5 is brand new and
        # moves the recency anchor forward
        ev([(0, "2024-01-10 09:00:00", 99.5), (0, "2024-01-11 09:00:00", 0.5),
            (5, "2024-01-12 08:00:00", 7.0)]),
        # NULL user and NULL ts rows must be ignored, exactly like batch
        ev([(None, "2024-01-13 10:00:00", 50.0), (2, None, 50.0),
            (2, "2024-01-13 11:00:00", 0.125)]),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "rfm_state")
    scores_dir = str(tmp_path / "scores")
    q = (
        streaming_rfm_scores(
            spark, batches[0].schema, str(incoming),
            state_dir, scores_dir, "user_id", "ts", "value",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = [
        "user_id", "recency_days", "frequency", "monetary_milli",
        "r_tile", "f_tile", "m_tile", "rfm_code",
    ]
    published = spark.read.parquet(scores_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in rfm_scores(acc, "user_id", "ts", "value").collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"


def test_streaming_rfm_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch, same id, folded twice) leaves
    the per-user partial state distinct-on-read and the published
    scores identical — frequencies and sums never double."""
    from gis_city_county_spark.streaming.rfm import rfm_batch_folder

    state_dir = str(tmp_path / "state")
    scores_dir = str(tmp_path / "scores")
    fold = rfm_batch_folder(state_dir, scores_dir, "user_id", "ts", "value")
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 3.5), (1, "2024-01-02 10:00:00", 1.5),
         (2, "2024-01-03 10:00:00", 9.0)],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(scores_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(scores_dir).collect())
    assert twice == once
    partials = spark.read.parquet(f"{state_dir}/per_user_partials")
    assert partials.count() == 2 * partials.distinct().count()
    final = {r["user_id"]: r for r in spark.read.parquet(scores_dir).collect()}
    assert final[1]["frequency"] == 2 and final[1]["monetary_milli"] == 5000
    assert final[2]["frequency"] == 1


def test_streaming_seasonal_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch seasonal-baseline
    maintainer: after each batch the published report partition is
    BIT-EQUAL to the batch ``seasonal_baseline`` over every row arrived
    so far — the calendar span widens as later days arrive, so the
    zero-filled grid (and every slot's median) genuinely shifts."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import seasonal_baseline
    from gis_city_county_spark.streaming.seasonal import (
        streaming_seasonal_baseline,
    )

    def ev(rows):
        return spark.createDataFrame(rows, "ts_s string").select(
            F.col("ts_s").cast("timestamp").alias("ts")
        )

    batches = [
        ev([("2024-01-01 09:00:00",), ("2024-01-01 09:20:00",),
            ("2024-01-02 14:00:00",)]),
        # widens the calendar by a week: dozens of zero cells appear
        ev([("2024-01-08 09:00:00",), ("2024-01-09 03:00:00",)]),
        # NULL timestamps are out, exactly like batch
        ev([(None,), ("2024-01-05 09:10:00",), ("2024-01-05 09:30:00",)]),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "seasonal_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_seasonal_baseline(
            spark, batches[0].schema, str(incoming),
            state_dir, report_dir, "ts", top_k=10,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["day", "hour", "dow", "n_events", "baseline", "deviation"]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in seasonal_baseline(acc, "ts", top_k=10).collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"


def test_streaming_seasonal_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch, same id, folded twice) leaves
    the count state distinct-on-read and the published report
    identical — cell counts never double."""
    from gis_city_county_spark.streaming.seasonal import seasonal_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = seasonal_batch_folder(state_dir, report_dir, "ts", top_k=5)
    # Two Mondays: (Mon, 9h) has counts (2, 0) => baseline 0, so the
    # 2-event cell carries deviation 2 — a doubled retry would read 4.
    b0 = spark.createDataFrame(
        [("2024-01-01 09:00:00",), ("2024-01-01 09:30:00",),
         ("2024-01-08 10:00:00",)], "ts_s string"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    cells = spark.read.parquet(f"{state_dir}/cell_counts")
    assert cells.count() == 2 * cells.distinct().count()
    top = sorted(
        spark.read.parquet(report_dir).collect(),
        key=lambda r: -abs(r["deviation"]),
    )[0]
    assert top["hour"] == 9 and top["n_events"] == 2  # not 4
    assert top["deviation"] == 2


def test_streaming_rfm_empty_batch_republishes(spark, tmp_path):
    """A micro-batch whose rows are ALL filtered out (NULL user/ts)
    must still publish a scores partition for its batch_id over the
    existing state — consumers key on max(batch_id), and a skipped
    publish would surface a stale release as the newest (round-9
    ADVICE).  An empty FIRST batch (no prior state) publishes
    nothing."""
    from gis_city_county_spark.streaming.rfm import rfm_batch_folder

    state_dir = str(tmp_path / "state")
    scores_dir = str(tmp_path / "scores")
    fold = rfm_batch_folder(state_dir, scores_dir, "user_id", "ts", "value")
    empty = spark.createDataFrame(
        [(None, None, 1.0)], "user_id long, ts timestamp, value double"
    )
    fold(empty, 0)  # empty FIRST batch: no state, no publish
    import os
    assert not os.path.exists(scores_dir)

    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 3.5), (2, "2024-01-03 10:00:00", 9.0)],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    fold(b1, 1)
    fold(empty, 2)  # all rows filtered: must still publish batch 2
    scores = spark.read.parquet(scores_dir)
    assert scores.agg(F.max("batch_id")).first()[0] == 2
    p1 = sorted(
        tuple(r) for r in scores.filter("batch_id = 1")
        .drop("batch_id").collect()
    )
    p2 = sorted(
        tuple(r) for r in scores.filter("batch_id = 2")
        .drop("batch_id").collect()
    )
    assert p2 == p1 and len(p2) == 2  # same release, fresher id


def test_streaming_seasonal_empty_batch_republishes(spark, tmp_path):
    """Same contract for the seasonal twin: an all-NULL-ts batch
    republishes the current report under the new batch_id."""
    from gis_city_county_spark.streaming.seasonal import seasonal_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = seasonal_batch_folder(state_dir, report_dir, "ts", top_k=5)
    empty = spark.createDataFrame([(None,)], "ts timestamp")
    fold(empty, 0)
    import os
    assert not os.path.exists(report_dir)

    b1 = spark.createDataFrame(
        [("2024-01-01 09:00:00",), ("2024-01-08 10:00:00",)], "ts_s string"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b1, 1)
    fold(empty, 2)
    rep = spark.read.parquet(report_dir)
    assert rep.agg(F.max("batch_id")).first()[0] == 2
    p1 = sorted(tuple(r) for r in rep.filter("batch_id = 1")
                .drop("batch_id").collect())
    p2 = sorted(tuple(r) for r in rep.filter("batch_id = 2")
                .drop("batch_id").collect())
    assert p2 == p1 and len(p2) > 0


def test_streaming_stickiness_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch stickiness
    maintainer: after each batch the published report partition is
    BIT-EQUAL to the batch ``stickiness_report`` over every row
    arrived so far — later batches revisit earlier days (DAU grows)
    and extend the horizon (new report days appear)."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import stickiness_report
    from gis_city_county_spark.streaming.stickiness import (
        streaming_stickiness_report,
    )

    def ev(rows):
        return spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    batches = [
        ev([(1, "2024-01-01 09:00:00"), (1, "2024-01-01 17:00:00"),
            (2, "2024-01-01 10:00:00"), (1, "2024-01-02 08:00:00")]),
        # revisits day 1 (user 3 joins it late) and adds day 5
        ev([(3, "2024-01-01 23:00:00"), (2, "2024-01-05 11:00:00")]),
        # NULL user/ts are out, exactly like batch
        ev([(None, "2024-01-02 09:00:00"), (4, None),
            (4, "2024-02-03 12:00:00")]),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "stick_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_stickiness_report(
            spark, batches[0].schema, str(incoming),
            state_dir, report_dir, "user_id", "ts", window_days=7,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["report_day", "dau", "mau7", "stickiness_ppm"]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in stickiness_report(
                acc.filter(F.col("user_id").isNotNull()
                           & F.col("ts").isNotNull()),
                "user_id", "ts", window_days=7,
            ).collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"


def test_streaming_stickiness_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch, same id, folded twice) leaves
    the (user, day) state distinct-on-read and the published report
    identical — DAU/MAU never double-count."""
    from gis_city_county_spark.streaming.stickiness import (
        stickiness_batch_folder,
    )

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = stickiness_batch_folder(state_dir, report_dir, "user_id", "ts",
                                   window_days=7)
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00"), (2, "2024-01-01 10:00:00"),
         (1, "2024-01-03 09:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    days = spark.read.parquet(f"{state_dir}/user_days")
    assert days.count() == 2 * days.distinct().count()
    rep = {r["report_day"].day: r for r in
           spark.read.parquet(report_dir).collect()}
    assert rep[1]["dau"] == 2 and rep[1]["mau7"] == 2
    assert rep[3]["dau"] == 1 and rep[3]["mau7"] == 2  # not 4


def test_streaming_stickiness_empty_batch_republishes(spark, tmp_path):
    """The shared empty-batch contract: an all-NULL batch republishes
    the current report under the new batch_id; an empty FIRST batch
    publishes nothing."""
    from gis_city_county_spark.streaming.stickiness import (
        stickiness_batch_folder,
    )

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = stickiness_batch_folder(state_dir, report_dir, "user_id", "ts")
    empty = spark.createDataFrame(
        [(None, None)], "user_id long, ts timestamp"
    )
    fold(empty, 0)
    import os
    assert not os.path.exists(report_dir)

    b1 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00")], "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b1, 1)
    fold(empty, 2)
    rep = spark.read.parquet(report_dir)
    assert rep.agg(F.max("batch_id")).first()[0] == 2
    p1 = sorted(tuple(r) for r in rep.filter("batch_id = 1")
                .drop("batch_id").collect())
    p2 = sorted(tuple(r) for r in rep.filter("batch_id = 2")
                .drop("batch_id").collect())
    assert p2 == p1 and len(p2) > 0


def test_streaming_growth_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch growth-
    accounting maintainer: after each batch the published report
    partition is BIT-EQUAL to the batch ``growth_accounting`` over
    every row arrived so far — a LATE batch adds a week BETWEEN two
    known weeks, re-classifying a resurrected user as retained."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import growth_accounting
    from gis_city_county_spark.streaming.growth import (
        streaming_growth_accounting,
    )

    def ev(rows):
        return spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    batches = [
        ev([(1, "2024-01-01 09:00:00"), (2, "2024-01-01 10:00:00"),
            (1, "2024-01-15 08:00:00")]),     # user 1 resurrects in w3
        ev([(3, "2024-01-08 23:00:00"), (2, "2024-01-22 11:00:00")]),
        # LATE week for user 1 between w1 and w3: w2 arrives last, so
        # the w3 classification flips resurrected -> retained
        ev([(1, "2024-01-08 12:00:00"), (None, "2024-01-02 09:00:00"),
            (4, None)]),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "growth_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_growth_accounting(
            spark, batches[0].schema, str(incoming),
            state_dir, report_dir, "user_id", "ts",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["week", "n_active", "n_new", "n_retained", "n_resurrected",
            "n_churned"]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in growth_accounting(acc, "user_id", "ts").collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"


def test_streaming_growth_retry_and_empty_batch(spark, tmp_path):
    """The shared replay/empty-batch contracts: a retried fold leaves
    state distinct-on-read and the report identical; an all-NULL
    batch republishes under the new batch_id."""
    from gis_city_county_spark.streaming.growth import growth_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = growth_batch_folder(state_dir, report_dir, "user_id", "ts")
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00"), (2, "2024-01-08 10:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    weeks = spark.read.parquet(f"{state_dir}/user_weeks")
    assert weeks.count() == 2 * weeks.distinct().count()

    empty = spark.createDataFrame(
        [(None, None)], "user_id long, ts timestamp"
    )
    fold(empty, 1)
    rep = spark.read.parquet(report_dir)
    assert rep.agg(F.max("batch_id")).first()[0] == 1
    p0 = sorted(tuple(r) for r in rep.filter("batch_id = 0")
                .drop("batch_id").collect())
    p1 = sorted(tuple(r) for r in rep.filter("batch_id = 1")
                .drop("batch_id").collect())
    assert p1 == p0 and len(p1) > 0


def test_streaming_hazard_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch hazard-table
    maintainer: after each batch the published life table is
    BIT-EQUAL to the batch ``hazard_table`` over every row arrived so
    far — a late batch EXTENDS one user's span (flipping their
    lifetime bucket) and moves the global censoring horizon."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import hazard_table
    from gis_city_county_spark.streaming.hazard import (
        streaming_hazard_table,
    )

    def ev(rows):
        return spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    batches = [
        ev([(1, "2024-01-01 09:00:00"), (1, "2024-01-04 09:00:00"),
            (2, "2024-01-02 12:00:00")]),
        # horizon jumps to Jan 28; user 3 appears
        ev([(3, "2024-01-10 08:00:00"), (3, "2024-01-28 10:00:00")]),
        # LATE events: user 1's span extends (lifetime 3 -> 20) and
        # user 2 gains an earlier first event; NULLs are out
        ev([(1, "2024-01-21 09:00:00"), (2, "2024-01-01 01:00:00"),
            (None, "2024-01-02 00:00:00"), (4, None)]),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "hazard_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_hazard_table(
            spark, batches[0].schema, str(incoming),
            state_dir, report_dir, "user_id", "ts", churn_gap_days=7,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["day_index", "n_at_risk", "n_churned", "n_censored",
            "hazard_ppm"]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in hazard_table(acc, "user_id", "ts",
                                  churn_gap_days=7).collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"


def test_streaming_hazard_retry_and_empty_batch(spark, tmp_path):
    """The shared replay/empty-batch contracts for the span-state
    twin: a retried fold leaves state distinct-on-read and the table
    identical; an all-NULL batch republishes under the new
    batch_id."""
    from gis_city_county_spark.streaming.hazard import hazard_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = hazard_batch_folder(state_dir, report_dir, "user_id", "ts")
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00"), (1, "2024-01-05 09:00:00"),
         (2, "2024-01-03 10:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    spans = spark.read.parquet(f"{state_dir}/user_spans")
    assert spans.count() == 2 * spans.distinct().count()

    empty = spark.createDataFrame(
        [(None, None)], "user_id long, ts timestamp"
    )
    fold(empty, 1)
    rep = spark.read.parquet(report_dir)
    assert rep.agg(F.max("batch_id")).first()[0] == 1
    p0 = sorted(tuple(r) for r in rep.filter("batch_id = 0")
                .drop("batch_id").collect())
    p1 = sorted(tuple(r) for r in rep.filter("batch_id = 1")
                .drop("batch_id").collect())
    assert p1 == p0 and len(p1) > 0


# ------------------------------------------------ MAD anomaly twin


def test_streaming_mad_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch MAD maintainer:
    after each batch the published report partition is BIT-EQUAL to
    the batch ``daily_mad_anomalies`` over every row arrived so far —
    later batches revisit earlier days (their counts grow) and extend
    the calendar (the zero-filled grid and both medians re-derive)."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import daily_mad_anomalies
    from gis_city_county_spark.streaming.mad import streaming_mad_anomalies

    def ev(rows):
        return spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    batches = [
        ev([(1, "2024-01-01 09:00:00"), (1, "2024-01-01 17:00:00"),
            (2, "2024-01-02 10:00:00"), (1, "2024-01-02 08:00:00"),
            (3, "2024-01-04 08:00:00")]),
        # revisits day 1 (late event) and stretches the grid to day 9
        # (days 5-8 become zero-count rows — anomaly candidates)
        ev([(3, "2024-01-01 23:00:00"), (2, "2024-01-09 11:00:00")]),
        # NULL ts is out, exactly like batch; a burst lands on day 9
        ev([(4, None)] + [(5, "2024-01-09 12:00:00")] * 6),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "mad_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_mad_anomalies(
            spark, batches[0].schema, str(incoming),
            state_dir, report_dir, "ts",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["day", "n_events", "median_n", "abs_deviation", "mad",
            "is_anomaly"]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in daily_mad_anomalies(acc, "ts").collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"
    # The day-9 burst is flagged in the final report (zero-majority
    # grid -> median 0, MAD 0 -> the any-deviation fallback: every
    # nonzero day flags, zero days don't).
    final = {r["day"].day: r for r in
             published.filter(F.col("batch_id") == 2).collect()}
    assert final[9]["is_anomaly"] and not final[5]["is_anomaly"]
    assert final[6]["n_events"] == 0  # zero-filled grid row exists


def test_streaming_mad_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch, same id, folded twice) leaves
    the day-count state distinct-on-read and the published report
    identical — counts never double."""
    from gis_city_county_spark.streaming.mad import mad_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = mad_batch_folder(state_dir, report_dir, "ts")
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00"), (2, "2024-01-01 10:00:00"),
         (1, "2024-01-03 09:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    counts = spark.read.parquet(f"{state_dir}/day_counts")
    assert counts.count() == 2 * counts.distinct().count()
    rep = {r["day"].day: r for r in
           spark.read.parquet(report_dir).collect()}
    assert rep[1]["n_events"] == 2 and rep[3]["n_events"] == 1  # not 4/2


def test_streaming_mad_empty_batch_republishes(spark, tmp_path):
    """The shared empty-batch contract: an all-NULL batch republishes
    the current report under the new batch_id; an empty FIRST batch
    publishes nothing."""
    import os

    from gis_city_county_spark.streaming.mad import mad_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = mad_batch_folder(state_dir, report_dir, "ts")
    empty = spark.createDataFrame(
        [(None, None)], "user_id long, ts timestamp"
    )
    fold(empty, 0)
    assert not os.path.exists(report_dir)

    b1 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00")], "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b1, 1)
    fold(empty, 2)
    rep = spark.read.parquet(report_dir)
    assert rep.agg(F.max("batch_id")).first()[0] == 2
    p1 = sorted(tuple(r) for r in rep.filter("batch_id = 1")
                .drop("batch_id").collect())
    p2 = sorted(tuple(r) for r in rep.filter("batch_id = 2")
                .drop("batch_id").collect())
    assert p2 == p1 and len(p2) > 0


# ----------------------------------------------- CUSUM changepoint twin


def test_streaming_cusum_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch CUSUM
    maintainer: after each batch the published report partition is
    BIT-EQUAL to the batch ``cusum_changepoint`` over every row
    arrived so far — a late batch shifts the level and MOVES the
    argmax changepoint."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import cusum_changepoint
    from gis_city_county_spark.streaming.cusum import (
        streaming_cusum_changepoint,
    )

    def ev(rows):
        return spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    batches = [
        ev([(1, "2024-01-01 09:00:00"), (1, "2024-01-02 17:00:00"),
            (2, "2024-01-03 10:00:00")]),
        # a burst at the tail: the level shift moves the changepoint
        ev([(3, "2024-01-05 23:00:00")] * 8),
        # NULL ts is out, exactly like batch; day 1 gains late events
        ev([(4, None), (5, "2024-01-01 12:00:00"),
            (5, "2024-01-01 13:00:00")]),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "cusum_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_cusum_changepoint(
            spark, batches[0].schema, str(incoming),
            state_dir, report_dir, "ts",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["day", "n_events", "cusum_scaled", "is_changepoint",
            "cusum_abs_ppm"]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in cusum_changepoint(acc, "ts").collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"
    # Exactly one changepoint per published partition.
    for bid in range(3):
        flags = [r["is_changepoint"] for r in
                 published.filter(F.col("batch_id") == bid).collect()]
        assert sum(flags) == 1


def test_streaming_cusum_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry (same batch, same id, folded twice)
    leaves the day-count state distinct-on-read and the published
    report identical."""
    from gis_city_county_spark.streaming.cusum import cusum_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = cusum_batch_folder(state_dir, report_dir, "ts")
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00"), (2, "2024-01-01 10:00:00"),
         (1, "2024-01-03 09:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    counts = spark.read.parquet(f"{state_dir}/day_counts")
    assert counts.count() == 2 * counts.distinct().count()
    rep = {r["day"].day: r for r in
           spark.read.parquet(report_dir).collect()}
    assert rep[1]["n_events"] == 2 and rep[3]["n_events"] == 1  # not 4/2


def test_streaming_cusum_empty_batch_republishes(spark, tmp_path):
    """The shared empty-batch contract: an all-NULL batch republishes
    the current report under the new batch_id; an empty FIRST batch
    publishes nothing."""
    import os

    from gis_city_county_spark.streaming.cusum import cusum_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = cusum_batch_folder(state_dir, report_dir, "ts")
    empty = spark.createDataFrame(
        [(None, None)], "user_id long, ts timestamp"
    )
    fold(empty, 0)
    assert not os.path.exists(report_dir)

    b1 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00")], "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b1, 1)
    fold(empty, 2)
    rep = spark.read.parquet(report_dir)
    assert rep.agg(F.max("batch_id")).first()[0] == 2
    p1 = sorted(tuple(r) for r in rep.filter("batch_id = 1")
                .drop("batch_id").collect())
    p2 = sorted(tuple(r) for r in rep.filter("batch_id = 2")
                .drop("batch_id").collect())
    assert p2 == p1 and len(p2) > 0


# ------------------------------------------- Kaplan-Meier twin


def test_streaming_km_matches_batch_after_each_batch(spark, tmp_path):
    """Three arrival batches through the foreachBatch KM maintainer:
    after each batch the published survival curve — INCLUDING the
    canonical-order double product — is BIT-EQUAL to the batch
    ``km_curve`` over every row arrived so far; a late batch extends
    one user's span and moves the censoring horizon, re-deriving the
    whole curve."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.temporal import km_curve
    from gis_city_county_spark.streaming.km import streaming_km_curve

    def ev(rows):
        return spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    batches = [
        ev([(1, "2024-01-01 09:00:00"), (1, "2024-01-04 09:00:00"),
            (2, "2024-01-02 12:00:00")]),
        # horizon jumps to Jan 28; user 3 appears
        ev([(3, "2024-01-10 08:00:00"), (3, "2024-01-28 10:00:00")]),
        # LATE events: user 1's span extends (lifetime 3 -> 20) and
        # user 2 gains an earlier first event; NULLs are out
        ev([(1, "2024-01-21 09:00:00"), (2, "2024-01-01 01:00:00"),
            (None, "2024-01-02 00:00:00"), (4, None)]),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "km_state")
    report_dir = str(tmp_path / "reports")
    q = (
        streaming_km_curve(
            spark, batches[0].schema, str(incoming),
            state_dir, report_dir, "user_id", "ts", churn_gap_days=7,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = ["day_index", "n_at_risk", "n_churned", "n_censored",
            "km_survival", "survival_ppm"]
    published = spark.read.parquet(report_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in km_curve(acc, "user_id", "ts",
                              churn_gap_days=7).collect()
        )
        assert got == want and len(got) > 0, f"batch {bid} diverged"


def test_streaming_km_retry_and_empty_batch(spark, tmp_path):
    """The shared replay/empty-batch contracts on the KM twin: a
    retried fold leaves state distinct-on-read and the curve
    identical; an all-NULL batch republishes under the new
    batch_id."""
    from gis_city_county_spark.streaming.km import km_batch_folder

    state_dir = str(tmp_path / "state")
    report_dir = str(tmp_path / "reports")
    fold = km_batch_folder(state_dir, report_dir, "user_id", "ts")
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00"), (1, "2024-01-05 09:00:00"),
         (2, "2024-01-03 10:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(report_dir).collect())
    assert twice == once
    spans = spark.read.parquet(f"{state_dir}/user_spans")
    assert spans.count() == 2 * spans.distinct().count()

    empty = spark.createDataFrame(
        [(None, None)], "user_id long, ts timestamp"
    )
    fold(empty, 1)
    rep = spark.read.parquet(report_dir)
    assert rep.agg(F.max("batch_id")).first()[0] == 1
    p0 = sorted(tuple(r) for r in rep.filter("batch_id = 0")
                .drop("batch_id").collect())
    p1 = sorted(tuple(r) for r in rep.filter("batch_id = 1")
                .drop("batch_id").collect())
    assert p1 == p0 and len(p1) > 0


def test_streaming_script_profile_matches_batch_after_each_batch(
    spark, tmp_path
):
    """Three arrival batches through the foreachBatch script-census
    maintainer — including a Cyrillic/CJK batch and a new language
    group — and after each batch the published profile partition is
    BIT-EQUAL to running the batch ``script_profile`` over every
    document arrived so far."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.textstats import script_profile
    from gis_city_county_spark.streaming.script import (
        streaming_script_profile,
    )

    batches = [
        spark.createDataFrame(
            [(1, "hello plain latin text 123", "en"),
             (2, "more english words here", "en")],
            "id long, body string, lang string",
        ),
        spark.createDataFrame(
            [(3, "привет мир кириллица", "ru"),       # new group
             (4, "mixed latin и кириллица", "en")],   # flips en shares
            "id long, body string, lang string",
        ),
        spark.createDataFrame(
            [(5, "汉字文本 with some latin", "zh")],
            "id long, body string, lang string",
        ),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "script_state")
    profile_dir = str(tmp_path / "profiles")
    q = (
        streaming_script_profile(
            spark, batches[0].schema, str(incoming), state_dir,
            profile_dir, "lang", "body",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = [
        "lang", "n_chars", "latin_ppm", "digit_ppm", "space_ppm",
        "cyrillic_ppm", "greek_ppm", "cjk_ppm", "arabic_ppm",
        "other_ppm",
    ]
    published = spark.read.parquet(profile_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in script_profile(acc, "lang", "body").collect()
        )
        assert got == want, f"batch {bid}: {got} != {want}"


def test_streaming_script_profile_publish_is_retry_idempotent(
    spark, tmp_path
):
    """A foreachBatch retry (same batch, same id, folded twice)
    leaves the counter state distinct-on-read and the published
    profile partition with exactly one row set, identical values."""
    from gis_city_county_spark.streaming.script import (
        script_profile_batch_folder,
    )

    state_dir = str(tmp_path / "state")
    profile_dir = str(tmp_path / "profiles")
    fold = script_profile_batch_folder(
        state_dir, profile_dir, "lang", "body"
    )
    b0 = spark.createDataFrame(
        [(1, "latin и кириллица 12", "en"),
         (2, None, "en")],            # NULL text filtered, not a row
        "id long, body string, lang string",
    )
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(profile_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(profile_dir).collect())
    assert twice == once
    assert spark.read.parquet(profile_dir).count() == 1  # one lang group
    counts = spark.read.parquet(f"{state_dir}/script_counts")
    assert counts.distinct().count() == 1  # identical retry row collapses


def test_streaming_encoding_census_matches_batch_after_each_batch(
    spark, tmp_path
):
    """Three arrival batches through the foreachBatch damage-census
    maintainer — a clean batch, a mojibake+U+FFFD batch that flips
    the rates, and a control-char batch in a NEW group — and after
    each batch the published census partition is BIT-EQUAL to the
    batch ``encoding_anomaly`` over every document arrived so far."""
    import glob
    import os
    import shutil
    import time

    from gis_city_county_spark.operators.textstats import encoding_anomaly
    from gis_city_county_spark.streaming.encoding import (
        streaming_encoding_anomaly,
    )

    batches = [
        spark.createDataFrame(
            [(1, "perfectly clean text", "web"),
             (2, "also clean here", "web")],
            "id long, body string, src string",
        ),
        spark.createDataFrame(
            [(3, "broken mojibake Ã© here", "web"),
             (4, "lost char � mid-doc", "web")],
            "id long, body string, src string",
        ),
        spark.createDataFrame(
            [(5, "binary\x01junk\x02text", "books"),
             (6, None, "books")],         # NULL text: counted, no flags
            "id long, body string, src string",
        ),
    ]

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    stage = tmp_path / "stage"
    now = time.time()
    for i, b in enumerate(batches):
        staged = str(stage / f"b{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        dest = str(incoming / f"b{i}.parquet")
        shutil.copyfile(part, dest)
        os.utime(dest, (now - 90 + i * 30, now - 90 + i * 30))

    state_dir = str(tmp_path / "enc_state")
    census_dir = str(tmp_path / "census")
    q = (
        streaming_encoding_anomaly(
            spark, batches[0].schema, str(incoming), state_dir,
            census_dir, "src", "body",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cols = [
        "src", "n_docs", "replacement_docs", "mojibake_docs",
        "ctrl_char_total", "replacement_doc_ppm", "mojibake_doc_ppm",
    ]
    published = spark.read.parquet(census_dir)
    acc = None
    for bid, b in enumerate(batches):
        acc = b if acc is None else acc.unionByName(b)
        got = sorted(
            tuple(r[c] for c in cols)
            for r in published.filter(F.col("batch_id") == bid).collect()
        )
        want = sorted(
            tuple(r[c] for c in cols)
            for r in encoding_anomaly(acc, "src", "body").collect()
        )
        assert got == want, f"batch {bid}: {got} != {want}"


def test_streaming_encoding_census_publish_is_retry_idempotent(
    spark, tmp_path
):
    """A foreachBatch retry (same batch, same id, folded twice)
    leaves the counter state distinct-on-read and the published
    census partition with exactly one row set, identical values."""
    from gis_city_county_spark.streaming.encoding import (
        encoding_census_batch_folder,
    )

    state_dir = str(tmp_path / "state")
    census_dir = str(tmp_path / "census")
    fold = encoding_census_batch_folder(
        state_dir, census_dir, "src", "body"
    )
    b0 = spark.createDataFrame(
        [(1, "damaged Ã© doc", "web"), (2, "clean", "web")],
        "id long, body string, src string",
    )
    fold(b0, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(census_dir).collect())
    fold(b0, 0)  # the retry
    twice = sorted(tuple(r) for r in spark.read.parquet(census_dir).collect())
    assert twice == once
    assert spark.read.parquet(census_dir).count() == 1  # one src group
    counts = spark.read.parquet(f"{state_dir}/encoding_counts")
    assert counts.distinct().count() == 1  # identical retry row collapses
