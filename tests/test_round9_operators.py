"""Round-9 additions and ADVICE-r8 regression pins."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


# --------------------------------- ADVICE r8: cumulative_distinct NULLs


def test_cumulative_distinct_drops_all_null_ts_keys(spark):
    """A key whose events ALL have NULL timestamps must not emit a
    NULL-day row (Spark windows order NULLs FIRST, DuckDB LAST — the
    running sum would diverge on every row); a key with a mix keeps
    its min non-NULL day.  Spark and the DuckDB twin must agree on
    exactly this fixture."""
    from gis_city_county_spark.operators.temporal import (
        cumulative_distinct,
        cumulative_distinct_sql,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, None),                    # mixed: min skips the NULL
            (2, None),                    # all-NULL key: dropped
            (3, "2024-01-02 09:00:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))

    got = sorted(
        (r["day"].strftime("%Y-%m-%d"), r["n_new"], r["cum_distinct"])
        for r in cumulative_distinct(ev, "user_id", "ts").collect()
    )
    assert got == [("2024-01-01", 1, 1), ("2024-01-02", 1, 2)]

    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    want = sorted(
        (r[0].strftime("%Y-%m-%d"), r[1], r[2])
        for r in con.execute(
            cumulative_distinct_sql("SELECT * FROM ev", "user_id", "ts")
        ).fetchall()
    )
    assert got == want


def test_streaming_distinct_fold_skips_null_days(spark, tmp_path):
    """The streaming fold mirrors the batch NULL-day rule: an all-NULL
    batch contributes nothing to state, and a later real timestamp
    still first-seens the key."""
    from gis_city_county_spark.streaming.distinct import distinct_batch_folder

    state = str(tmp_path / "state")
    curve = str(tmp_path / "curve")
    fold = distinct_batch_folder(state, curve, "user_id", "ts")

    b1 = spark.createDataFrame(
        [(7, None), (8, "2024-01-01 10:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b1, 0)
    rows = {r["cum_distinct"] for r in spark.read.parquet(curve).collect()}
    assert rows == {1}  # only key 8; key 7's NULL day never enters state

    b2 = spark.createDataFrame(
        [(7, "2024-01-02 09:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b2, 1)
    latest = {
        r["day"].strftime("%Y-%m-%d"): r["cum_distinct"]
        for r in spark.read.parquet(curve)
        .filter(F.col("batch_id") == 1).collect()
    }
    assert latest == {"2024-01-01": 1, "2024-01-02": 2}


# ----------------------------- ADVICE r8: position_attribution boundary


def test_position_attribution_subsecond_lookback_boundary(spark):
    """A touch landing EXACTLY lookback_seconds before a sub-second
    conversion timestamp must be included identically on both engines
    — the r8 double-seconds comparison could flip it by one ulp; the
    fix compares exact integer microseconds."""
    from gis_city_county_spark.operators.temporal import (
        position_attribution,
        position_attribution_sql,
    )

    conv = spark.createDataFrame(
        [(100, 1, "2024-01-10 12:00:00.000123")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    touch = spark.createDataFrame(
        [
            # exactly on the 3600s boundary (inclusive)
            (11, 1, "2024-01-10 11:00:00.000123", "edge"),
            # one microsecond before the boundary (excluded)
            (12, 1, "2024-01-10 11:00:00.000122", "out"),
        ],
        "event_id long, user_id long, ts_s string, channel string",
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"), "channel",
    )

    got = sorted(
        tuple(r)
        for r in position_attribution(
            conv, touch, ["user_id"], "event_id", "ts", "ts",
            "channel", "event_id", lookback_seconds=3600.0,
        ).collect()
    )
    assert got == [("edge", 1, 1000)]

    con = duckdb.connect()
    con.register("conv", conv.toPandas())
    con.register("touch", touch.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            position_attribution_sql(
                "SELECT * FROM conv", "SELECT * FROM touch",
                ["user_id"], "event_id", "ts", "ts", "channel",
                "event_id", lookback_seconds=3600.0,
            )
        ).fetchall()
    )
    assert got == want


# -------------------------------------------- clustering_coefficient


def test_clustering_coefficient_exact_fixture(spark):
    """Two triangles sharing node 2 plus a pendant edge: transitivity
    = 3·2/10 = 0.6, average local cc = mean(1,1,1/3,1,1) at ppm floors
    — and the DuckDB twin matches bit-for-bit."""
    from gis_city_county_spark.operators.graph import (
        clustering_coefficient,
        clustering_coefficient_sql,
    )

    fixture = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 2), (5, 6)]
    edges = spark.createDataFrame(fixture, "src long, dst long")
    row = clustering_coefficient(edges).collect()[0]
    assert row["n_nodes"] == 7 and row["n_edges"] == 7
    assert row["n_triangles"] == 2 and row["n_wedges"] == 10
    assert row["transitivity_ppm"] == 600_000
    # (4 * 1_000_000 + 333_333) div 5
    assert row["avg_local_cc_ppm"] == 866_666

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", fixture)
    want = con.execute(
        clustering_coefficient_sql("SELECT src, dst FROM e")
    ).fetchall()
    assert tuple(row) == want[0]


def test_clustering_coefficient_degenerate_graphs(spark):
    """A single edge has no wedges (both ratios NULL); a 4-cycle has
    wedges but zero triangles (transitivity 0, local cc 0); duplicate
    and reversed edges collapse to one undirected edge."""
    from gis_city_county_spark.operators.graph import clustering_coefficient

    single = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2)], "src long, dst long"
    )
    row = clustering_coefficient(single).collect()[0]
    assert row["n_edges"] == 1 and row["n_wedges"] == 0
    assert row["transitivity_ppm"] is None
    assert row["avg_local_cc_ppm"] is None

    cycle = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    row = clustering_coefficient(cycle).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 4
    assert row["transitivity_ppm"] == 0
    assert row["avg_local_cc_ppm"] == 0


# ---------------------------------------------- substring_dup_pairs


def test_substring_dup_pairs_diagonal_runs(spark):
    """Two documents sharing one contiguous 12-token span (and nothing
    else long) report longest_match_tokens == 12 exactly; a scattered
    overlap of the same words does NOT fire the span threshold."""
    from gis_city_county_spark.operators.dedup import substring_dup_pairs

    span = " ".join(f"w{i}" for i in range(12))
    filler_a = " ".join(f"a{i}" for i in range(30))
    filler_b = " ".join(f"b{i}" for i in range(30))
    # scattered: same 12 words but interleaved with junk, no k=4 window
    scattered = " ".join(f"w{i} x{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, f"{filler_a} {span}"),
            (2, f"{span} {filler_b}"),
            (3, f"{scattered} {' '.join(f'c{i}' for i in range(20))}"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["a_id"], r["b_id"]): r
        for r in substring_dup_pairs(
            docs, "doc_id", "text", k=4, min_match_tokens=10,
            max_window_df=3,
        ).collect()
    }
    assert set(out) == {(1, 2)}
    assert out[(1, 2)]["longest_match_tokens"] == 12
    assert out[(1, 2)]["max_run"] == 9  # 12 - 4 + 1


def test_substring_dup_pairs_matches_duckdb_on_documents(spark, sf_dir):
    from gis_city_county_spark.operators.dedup import (
        substring_dup_pairs,
        substring_dup_pairs_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in substring_dup_pairs(docs, "doc_id", "text").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            substring_dup_pairs_sql("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_substring_dup_pairs_repeated_window_in_one_doc(spark):
    """A window string occurring twice inside ONE document must not
    inflate the run (the matched relation is DISTINCT per diagonal
    cell) — the repeated text still pairs, with the true span."""
    from gis_city_county_spark.operators.dedup import substring_dup_pairs

    chorus = "la la la la"          # k=4 window 'la la la la' repeats
    docs = spark.createDataFrame(
        [
            (1, f"{chorus} {chorus} end one two three four five"),
            (2, f"intro {chorus} {chorus} outro six seven eight"),
        ],
        "doc_id long, text string",
    )
    out = substring_dup_pairs(
        docs, "doc_id", "text", k=4, min_match_tokens=5, max_window_df=4
    ).collect()
    assert len(out) == 1
    # shared contiguous span is the 8-token double chorus
    assert out[0]["longest_match_tokens"] == 8


# --------------------------------------------- krippendorff_alpha


def test_krippendorff_alpha_textbook_fixture(spark):
    """Variable ratings per item (the case Fleiss rejects): the nominal
    coincidence-matrix alpha comes out exactly, single-rating items are
    excluded from pairing but counted in n_items, NULL raters/labels
    drop, and the DuckDB twin matches bit-for-bit."""
    from gis_city_county_spark.operators.mlprep import (
        krippendorff_alpha,
        krippendorff_alpha_sql,
    )

    rows = [
        (1, "A", "yes"), (1, "B", "yes"),
        (2, "A", "yes"), (2, "B", "no"), (2, "C", "yes"),
        (3, "A", "no"), (3, "B", "no"),
        (4, "C", "yes"),                     # single rating: unpairable
        (5, "A", "no"), (5, "B", "yes"), (5, "C", "no"),
        (5, None, "no"),                     # NULL rater: dropped
    ]
    df = spark.createDataFrame(rows, "item long, rater string, label string")
    row = krippendorff_alpha(df, "item", "rater", "label").collect()[0]
    assert row["n_items"] == 5 and row["n_pairable_items"] == 4
    assert row["n_values"] == 10 and row["n_categories"] == 2
    # by hand: Do terms 0 + 4/2 + 0 + 4/2 = 4; marginals 5/5 ->
    # De_sum = 100 - 50 = 50; alpha = 1 - 9*4/50 = 0.28
    assert row["disagree_nano"] == 4_000_000_000
    assert abs(row["alpha"] - 0.28) < 1e-12

    con = duckdb.connect()
    con.execute("CREATE TABLE r(item BIGINT, rater VARCHAR, label VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", rows)
    want = con.execute(
        krippendorff_alpha_sql("SELECT * FROM r", "item", "rater", "label")
    ).fetchall()
    assert tuple(row) == want[0]


def test_krippendorff_alpha_edge_cases(spark):
    """Perfect agreement gives alpha 1; a single category gives NULL
    (De_sum = 0, chance correction undefined)."""
    from gis_city_county_spark.operators.mlprep import krippendorff_alpha

    perfect = spark.createDataFrame(
        [(1, "A", "x"), (1, "B", "x"), (2, "A", "y"), (2, "B", "y")],
        "item long, rater string, label string",
    )
    row = krippendorff_alpha(perfect, "item", "rater", "label").collect()[0]
    assert row["disagree_nano"] == 0 and row["alpha"] == 1.0

    mono = spark.createDataFrame(
        [(1, "A", "x"), (1, "B", "x"), (2, "A", "x")],
        "item long, rater string, label string",
    )
    row = krippendorff_alpha(mono, "item", "rater", "label").collect()[0]
    assert row["n_categories"] == 1 and row["alpha"] is None


# ------------------------------------------------------- rfm_scores


def test_rfm_scores_exact_tiles(spark):
    """Five users, n_tiles=5: each user lands in its own tile per
    dimension; recency anchors to the corpus max date; NULL values
    contribute nothing to monetary; rank ties break by user id."""
    from gis_city_county_spark.operators.temporal import rfm_scores

    rows = []
    # user u has (u+1) events, last on day 10-u, each worth 10*u + 0.5
    for u in range(5):
        for i in range(u + 1):
            rows.append((u, f"2024-01-{10 - u:02d} 12:00:00", 10.0 * u + 0.5))
    rows.append((0, "2024-01-01 00:00:00", None))  # NULL value event
    ev = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    )
    out = {r["user_id"]: r for r in rfm_scores(ev, "user_id", "ts", "value").collect()}
    assert len(out) == 5
    # user 0: most recent (day 10 == anchor), fewest events
    assert out[0]["recency_days"] == 0 and out[0]["r_tile"] == 1
    assert out[0]["frequency"] == 2  # incl. the NULL-value event
    assert out[4]["recency_days"] == 4 and out[4]["r_tile"] == 5
    # frequency tiles: user 4 has most events -> tile 1; the NULL-value
    # event ties user 0 with user 1 at frequency 2, and the user-id
    # tiebreak ranks user 0 ahead (tile 4) of user 1 (tile 5)
    assert out[4]["f_tile"] == 1
    assert out[0]["f_tile"] == 4 and out[1]["f_tile"] == 5
    # monetary: user 4 sum = 5 * 40.5 = 202.5 -> 202500 milli, tile 1
    assert out[4]["monetary_milli"] == 202_500 and out[4]["m_tile"] == 1
    # user 0 monetary = 0.5 + NULL -> 500 milli, tile 5
    assert out[0]["monetary_milli"] == 500 and out[0]["m_tile"] == 5
    assert out[4]["rfm_code"] == 511 and out[0]["rfm_code"] == 145


def test_rfm_scores_matches_duckdb_on_events(spark, sf_dir):
    from gis_city_county_spark.operators.temporal import (
        rfm_scores,
        rfm_scores_sql,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sorted(
        tuple(r) for r in rfm_scores(ev, "user_id", "ts", "value").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            rfm_scores_sql("SELECT * FROM events", "user_id", "ts", "value")
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------ readability_report


def test_readability_exact_counts(spark):
    """Letters/words/sentences count exactly; a no-punctuation text is
    one sentence; the Coleman-Liau grade comes off the milli-floored
    rates through the fixed-order IEEE chain."""
    from gis_city_county_spark.operators.textstats import readability_report

    docs = spark.createDataFrame(
        [
            ("a", "The cat sat. The dog ran!"),   # 6 words, 2 sentences
            ("a", "no punctuation here"),          # 3 words, 1 sentence
            ("b", None),                           # NULL text: dropped
        ],
        "source string, text string",
    )
    rows = {r["source"]: r for r in readability_report(docs, "source", "text").collect()}
    assert set(rows) == {"a"}
    r = rows["a"]
    assert r["n_docs"] == 2 and r["n_words"] == 9 and r["n_sentences"] == 3
    assert r["n_letters"] == 18 + 17  # letters only, no spaces/punct
    assert r["letters_per_100w_milli"] == (35 * 100_000) // 9
    assert r["sentences_per_100w_milli"] == (3 * 100_000) // 9
    expect = (
        0.0588 * (((35 * 100_000) // 9) / 1000.0)
        - 0.296 * (((3 * 100_000) // 9) / 1000.0)
        - 15.8
    )
    assert r["cli_grade"] == expect


# ------------------------------------------------ epoch_shuffle_plan


def test_epoch_shuffle_plan_moves_documents(spark):
    """Epoch 0 keeps every doc in its epoch-0 shard by definition;
    later epochs keep only the hash-collision share; per-epoch totals
    always cross-foot to n_docs."""
    from gis_city_county_spark.operators.corpus import epoch_shuffle_plan

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    out = epoch_shuffle_plan(docs, "doc_id", n_epochs=3, n_shards=4).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 1, 2}
    for e, rows in by_epoch.items():
        assert sum(r["n_docs"] for r in rows) == 200
        same = sum(r["n_same_as_epoch0"] for r in rows)
        if e == 0:
            assert same == 200
        else:
            # collision share ~ 200/4 = 50; hash-uniform, wide tolerance
            assert 20 <= same <= 90


def test_epoch_shuffle_plan_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.corpus import (
        epoch_shuffle_plan,
        epoch_shuffle_plan_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r) for r in epoch_shuffle_plan(docs, "doc_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            epoch_shuffle_plan_sql("SELECT * FROM documents", "doc_id")
        ).fetchall()
    )
    assert got == want and len(got) == 4 * 16


# ------------------------------------------------ aspect_bucket_plan


def test_aspect_bucket_assignment_exact(spark):
    """Hand-checked assignments: a square image lands in (1,1) with
    zero error and zero crop; a 16:10 image picks 3:2 over 16:9 only
    if its exact cross-multiplied error says so; crop_ppm is the exact
    cover-then-center-crop loss."""
    from gis_city_county_spark.operators.multimodal import (
        ASPECT_BUCKETS,
        aspect_bucket_plan,
        encode_bmp,
    )
    import numpy as np

    def mk(img_id, w, h):
        # solid-color BMP of the given dims via the repo's encoder
        img = np.full((h, w, 3), 128, dtype=np.uint8)
        return (img_id, bytearray(encode_bmp(img)))

    rows = [mk(0, 5, 5), mk(1, 16, 10), mk(2, 4, 3)]
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    out = {r["img_id"]: r for r in aspect_bucket_plan(df, "img_id", "payload").collect()}
    assert out[0]["bucket_w"] == 1 and out[0]["bucket_h"] == 1
    assert out[0]["aspect_err_ppm"] == 0 and out[0]["crop_ppm"] == 0
    assert out[2]["bucket_w"] == 4 and out[2]["bucket_h"] == 3
    # 16:10: err vs 3:2 = |16*2-10*3|/(10*3) = 2/30; vs 16:9 =
    # |16*9-10*16|/(10*16) = 16/160 = 1/10 -> 3:2 wins
    assert out[1]["bucket_w"] == 3 and out[1]["bucket_h"] == 2
    assert out[1]["aspect_err_ppm"] == (2 * 1_000_000) // 30
    # cover 3:2 from 16:10 (image wider): keep bw*h/(w*bh) = 30/32
    assert out[1]["crop_ppm"] == 1_000_000 - (3 * 10 * 1_000_000) // (16 * 2)
    # tiebreak sanity: every image got exactly one bucket from the ladder
    ids = {b[0] for b in ASPECT_BUCKETS}
    assert all(r["bucket_id"] in ids for r in out.values())


# --------------------------------------------------------- token_f1


def test_token_f1_exact_counts(spark):
    """TP/FP/FN count exactly; F1 uses the integer identity
    2TP/(2TP+FP+FN); NULL flags read as false; empty-denominator
    ratios are NULL."""
    from gis_city_county_spark.operators.mlprep import token_f1, token_f1_sql

    rows = [
        ("a", True, True),    # tp
        ("a", True, True),    # tp
        ("a", True, False),   # fn
        ("a", False, True),   # fp
        ("a", False, False),
        ("a", None, True),    # NULL gold -> fp
        ("b", False, False),  # no gold, no pred: ratios NULL
    ]
    df = spark.createDataFrame(rows, "g string, gold boolean, pred boolean")
    out = {r["g"]: r for r in token_f1(df, "g", "gold", "pred").collect()}
    a = out["a"]
    assert (a["tp"], a["fp"], a["fn"]) == (2, 2, 1)
    assert a["precision_ppm"] == 500_000
    assert a["recall_ppm"] == (2 * 1_000_000) // 3
    assert a["f1_ppm"] == (4 * 1_000_000) // 7
    b = out["b"]
    assert b["precision_ppm"] is None and b["recall_ppm"] is None
    assert b["f1_ppm"] is None

    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, gold BOOLEAN, pred BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            token_f1_sql("SELECT * FROM t", "g", "gold", "pred")
        ).fetchall()
    )
    got = sorted(tuple(r) for r in token_f1(df, "g", "gold", "pred").collect())
    assert got == want


# --------------------------------------------------- centroid_drift


def test_centroid_drift_exact_fixture(spark):
    """Two tiny snapshots: per-dimension quantized sums are exact, the
    delta is the single-double subtraction of the means, and an empty
    side coalesces to zero counts with NULL means."""
    from gis_city_county_spark.operators.similarity import (
        centroid_drift,
        centroid_drift_sql,
    )

    a = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "embedding array<float>"
    )
    b = spark.createDataFrame(
        [([2.0, 0.0],), ([2.0, 8.0],), ([2.0, 1.0],)],
        "embedding array<float>",
    )
    out = {r["pos"]: r for r in centroid_drift(a, b, "embedding").collect()}
    assert out[0]["n_a"] == 2 and out[0]["n_b"] == 3
    assert out[0]["sum_q8_a"] == 4 * 10**8 and out[0]["sum_q8_b"] == 6 * 10**8
    assert out[0]["mean_a"] == 2.0 and out[0]["mean_b"] == 2.0
    assert out[0]["delta"] == 0.0
    assert out[1]["mean_a"] == 3.0 and out[1]["mean_b"] == 3.0

    con = duckdb.connect()
    con.register("ea", a.toPandas())
    con.register("eb", b.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            centroid_drift_sql(
                "SELECT * FROM ea", "SELECT * FROM eb", "embedding"
            )
        ).fetchall()
    )
    got = sorted(tuple(r) for r in centroid_drift(a, b, "embedding").collect())
    assert got == want


# ----------------------------------------------- simpson_diversity


def test_simpson_diversity_exact(spark):
    """A single repeated token concentrates to 1e9 ppb with effective
    vocabulary 1; a uniform vocabulary of v types lands at 1e9/v with
    effective vocabulary v."""
    from gis_city_county_spark.operators.corpus import (
        simpson_diversity,
        simpson_diversity_sql,
    )

    docs = spark.createDataFrame(
        [
            ("mono", "spam spam spam spam"),
            ("uni", "a b c d"),
        ],
        "source string, text string",
    )
    out = {r["source"]: r for r in simpson_diversity(docs, "source", "text").collect()}
    assert out["mono"]["simpson_ppb"] == 1_000_000_000
    assert out["mono"]["effective_vocab"] == 1
    assert out["uni"]["n_vocab"] == 4
    assert out["uni"]["simpson_ppb"] == 250_000_000
    assert out["uni"]["effective_vocab"] == 4

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            simpson_diversity_sql("documents", "source", "text")
        ).fetchall()
    )
    got = sorted(tuple(r) for r in simpson_diversity(docs, "source", "text").collect())
    assert got == want


# --------------------------------------------------- hll_intersection


def test_hll_intersection_exact_audit_and_merge(spark):
    """The exact audit counts the true overlap; the union estimate is
    the register-max merge (== estimate of A∪B built directly); the
    intersection estimate is signed inclusion-exclusion and matches
    the DuckDB twin bit-for-bit."""
    from gis_city_county_spark.operators.sketch import (
        hll_intersection,
        hll_intersection_sql,
    )

    a = spark.createDataFrame([(i,) for i in range(0, 600)], "k long")
    b = spark.createDataFrame([(i,) for i in range(400, 1000)], "k long")
    row = hll_intersection(a, b, "k").collect()[0]
    assert row["exact_a"] == 600 and row["exact_b"] == 600
    assert row["exact_intersection"] == 200
    # inclusion-exclusion identity holds exactly on the reported ests
    assert row["est_intersection"] == row["est_a"] + row["est_b"] - row["est_union"]
    # at n >> m the raw estimate is in the right ballpark
    assert 100 <= row["est_intersection"] <= 350

    import pandas as pd
    con = duckdb.connect()
    con.register("ta", pd.DataFrame({"k": range(0, 600)}))
    con.register("tb", pd.DataFrame({"k": range(400, 1000)}))
    want = con.execute(
        hll_intersection_sql("SELECT k FROM ta", "SELECT k FROM tb", "k")
    ).fetchall()
    assert tuple(row) == want[0]


def test_hll_intersection_disjoint_sets(spark):
    """Disjoint populations: exact overlap 0; the signed estimate may
    be slightly negative (per-sketch error) but must stay small
    relative to the set sizes."""
    from gis_city_county_spark.operators.sketch import hll_intersection

    a = spark.createDataFrame([(i,) for i in range(0, 500)], "k long")
    b = spark.createDataFrame([(i,) for i in range(10_000, 10_500)], "k long")
    row = hll_intersection(a, b, "k").collect()[0]
    assert row["exact_intersection"] == 0
    assert abs(row["est_intersection"]) < 200


# ----------------------------------------------------- norm_histogram


def test_norm_histogram_bands_exact(spark):
    """Unit vectors land in band 10 (norm2 1.0 -> 1000 // 100); a 2x
    scaled vector lands at norm2 4.0 -> band 40; NULL vectors drop;
    the per-vector fold matches DuckDB's list_reduce bit-for-bit."""
    from gis_city_county_spark.operators.similarity import (
        norm_histogram,
        norm_histogram_sql,
    )

    rows = [
        ([1.0, 0.0, 0.0],),
        ([0.0, 1.0, 0.0],),
        ([2.0, 0.0, 0.0],),
        ([0.6, 0.8, 0.0],),   # unit
        (None,),
    ]
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = {r["band"]: r for r in norm_histogram(df, "embedding").collect()}
    assert out[10]["n_vecs"] == 3 and out[10]["norm2_lo_milli"] == 1000
    assert out[40]["n_vecs"] == 1
    assert sum(r["n_vecs"] for r in out.values()) == 4

    con = duckdb.connect()
    con.register("e", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            norm_histogram_sql("SELECT * FROM e", "embedding")
        ).fetchall()
    )
    got = sorted(tuple(r) for r in norm_histogram(df, "embedding").collect())
    assert got == want
