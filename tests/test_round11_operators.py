"""Round-11 operator tests.

Covers the LSH bucket cap on ``embedding_cosine_pairs`` (the
co-occurrence-cap treatment applied to the semantic-dedup path — the
round-10 verdict's closest-to-linear probe) and its truncation
report, plus the round's new operators.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ------------------------------------------- LSH bucket cap


def test_embedding_cosine_pairs_bucket_cap(spark):
    """With a binding cap the candidate universe shrinks to the
    md5-rank survivors per bucket — same ids on Spark and DuckDB —
    and the capped pair set is a SUBSET of the uncapped one; with the
    default cap (far above test occupancy) results are identical to
    uncapped."""
    import numpy as np

    from gis_city_county_spark.operators.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_sql,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(threshold=0.2, n_planes=16, bands=4, dim=8)
    uncapped = {
        (r["a_id"], r["b_id"])
        for r in embedding_cosine_pairs(
            df, "vec_id", "embedding", max_bucket=None, **kw
        ).collect()
    }
    default_cap = {
        (r["a_id"], r["b_id"])
        for r in embedding_cosine_pairs(
            df, "vec_id", "embedding", **kw
        ).collect()
    }
    assert default_cap == uncapped  # cap 256 never binds at n=120

    capped = sorted(
        tuple(r)
        for r in embedding_cosine_pairs(
            df, "vec_id", "embedding", max_bucket=3, **kw
        ).collect()
    )
    assert {(a, b) for a, b, _ in capped} <= uncapped
    assert len(capped) < len(uncapped)  # 16-bucket bands, 120 ids: binds

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[])"
    )
    con.executemany("INSERT INTO emb VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            embedding_cosine_pairs_sql(
                "emb", "vec_id", "embedding", max_bucket=3, **kw
            )
        ).fetchall()
    )
    assert capped == want


def test_lsh_bucket_truncation_report(spark):
    """Oversized buckets are named with exact pair accounting
    (true = kept + dropped), bounded output: only buckets past the
    cap; identical vectors land in one bucket per band."""
    from gis_city_county_spark.operators.similarity import (
        lsh_bucket_truncation_report,
    )

    # 10 identical vectors -> every band has one bucket of >= 10.
    rows = [(i, [1.0] * 8) for i in range(10)] + [
        (100 + i, [float(j == i) for j in range(8)]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rep = lsh_bucket_truncation_report(
        df, "vec_id", "embedding", n_planes=16, bands=4, dim=8, max_bucket=4
    ).collect()
    assert rep  # the identical-vector bucket is oversized in each band
    for r in rep:
        assert r["n_members"] > 4
        assert r["n_pairs_true"] == r["n_members"] * (r["n_members"] - 1) // 2
        assert r["n_pairs_kept"] == 4 * 3 // 2
        assert (
            r["n_pairs_dropped"] == r["n_pairs_true"] - r["n_pairs_kept"]
        )
    # The big bucket appears in all 4 bands.
    assert sum(1 for r in rep if r["n_members"] >= 10) >= 4


# ------------------------------------------------------- Chao1


def test_chao1_richness_fixture_and_parity(spark):
    """Hand-checkable frequency-of-frequencies: 7 tokens, vocab 5,
    f1=4, f2=0 -> chao1 = 5 + 4*3/(2*1) = 11; unseen = 4/7."""
    from gis_city_county_spark.operators.corpus import (
        chao1_richness,
        chao1_richness_sql,
    )

    rows = [(1, "g1", "a b c d"), (2, "g1", "a a e"),
            (3, "g2", "x x y y")]
    df = spark.createDataFrame(rows, "id long, g string, text string")
    out = {r["g"]: r for r in chao1_richness(df, "g", "text").collect()}
    g1 = out["g1"]
    assert g1["n_tokens"] == 7 and g1["vocab"] == 5
    assert g1["f1_singletons"] == 4 and g1["f2_doubletons"] == 0
    assert g1["chao1_vocab"] == 11
    assert g1["unseen_ppm"] == 4_000_000 // 7
    g2 = out["g2"]
    assert g2["vocab"] == 2 and g2["f1_singletons"] == 0
    assert g2["chao1_vocab"] == 2 and g2["unseen_ppm"] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, g VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = sorted(tuple(r) for r in chao1_richness(df, "g", "text").collect())
    want = sorted(tuple(r) for r in
                  con.execute(chao1_richness_sql("t", "g", "text")).fetchall())
    assert got == want


# ------------------------------------------------------ KM curve


def test_km_curve_product_identity_and_parity(spark):
    """km_survival equals the Python prefix product of the hazard
    factors (bit-for-bit), is nonincreasing, and bit-matches DuckDB."""
    from gis_city_county_spark.operators.temporal import (
        hazard_table,
        km_curve,
        km_curve_sql,
    )

    rows = [
        (1, "2024-01-01"), (1, "2024-01-03"),
        (2, "2024-01-01"),
        (3, "2024-01-01"), (3, "2024-01-10"),
        (4, "2024-01-02"), (4, "2024-01-05"),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").select(
        "user_id", F.col("d").cast("timestamp").alias("ts")
    )
    haz = {r["day_index"]: r for r in
           hazard_table(df, "user_id", "ts").collect()}
    out = km_curve(df, "user_id", "ts").collect()
    prod = 1.0
    for r in sorted(out, key=lambda r: r["day_index"]):
        h = haz[r["day_index"]]
        prod = prod * ((h["n_at_risk"] - h["n_churned"]) / h["n_at_risk"])
        assert r["km_survival"] == prod  # bit-equal fold
        assert r["survival_ppm"] == int(prod * 1_000_000 // 1)
    surv = [r["km_survival"] for r in sorted(out, key=lambda r: r["day_index"])]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?, ?)",
                    [(u, d + " 00:00:00") for u, d in rows])
    got = sorted(tuple(r) for r in out)
    want = sorted(tuple(r) for r in con.execute(
        km_curve_sql("SELECT * FROM ev", "user_id", "ts")).fetchall())
    assert got == want


# ---------------------------------------------------------- CUSUM


def test_cusum_changepoint_fixture_and_parity(spark):
    """Counts [1,1,10,10] over four days: cusum_scaled =
    [-18,-36,-18,0], changepoint at day 2 (max |cusum|), ppm =
    36e6 // 88."""
    from gis_city_county_spark.operators.temporal import (
        cusum_changepoint,
        cusum_changepoint_sql,
    )

    rows = []
    for day, n in [("2024-03-01", 1), ("2024-03-02", 1),
                   ("2024-03-03", 10), ("2024-03-04", 10)]:
        rows += [(day,)] * n
    df = spark.createDataFrame(rows, "d string").select(
        F.col("d").cast("timestamp").alias("ts")
    )
    out = sorted(cusum_changepoint(df, "ts").collect(),
                 key=lambda r: r["day"])
    assert [r["cusum_scaled"] for r in out] == [-18, -36, -18, 0]
    assert [r["is_changepoint"] for r in out] == [False, True, False, False]
    assert out[1]["cusum_abs_ppm"] == 36 * 1_000_000 // 88
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?)",
                    [(d + " 12:00:00",) for (d,) in rows])
    got = sorted(tuple(r) for r in out)
    want = sorted(tuple(r) for r in con.execute(
        cusum_changepoint_sql("SELECT * FROM ev", "ts")).fetchall())
    assert got == want


# ------------------------------------------------------ Cochran's Q


def test_cochrans_q_reference_and_parity(spark):
    """Cross-checked against the closed form on a hand fixture, the
    complete_design flag, and DuckDB parity."""
    from gis_city_county_spark.operators.mlprep import (
        cochrans_q,
        cochrans_q_sql,
    )

    # (item, rater, correct) — 4 items x 3 raters, known totals.
    data = {
        (1, "a"): 1, (1, "b"): 1, (1, "c"): 0,
        (2, "a"): 1, (2, "b"): 0, (2, "c"): 0,
        (3, "a"): 1, (3, "b"): 1, (3, "c"): 1,
        (4, "a"): 1, (4, "b"): 0, (4, "c"): 0,
    }
    rows = [(i, r, c) for (i, r), c in data.items()]
    df = spark.createDataFrame(rows, "item long, rater string, correct int")
    out = cochrans_q(df, "item", "rater", "correct").collect()[0]
    k = 3
    g = {r: sum(c for (i, rr), c in data.items() if rr == r)
         for r in "abc"}
    l = {i: sum(c for (ii, r), c in data.items() if ii == i)
         for i in range(1, 5)}
    num = (k - 1) * (k * sum(v * v for v in g.values())
                     - sum(g.values()) ** 2)
    den = k * sum(l.values()) - sum(v * v for v in l.values())
    assert out["n_items"] == 4 and out["k_raters"] == 3
    assert out["complete_design"]
    assert out["statistic_milli"] == 1000 * num // den
    con = duckdb.connect()
    con.execute("CREATE TABLE t (item BIGINT, rater VARCHAR, correct INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        cochrans_q_sql("SELECT * FROM t", "item", "rater", "correct")
    ).fetchall()[0]
    assert tuple(out) == want
    # Incomplete design flags false.
    df2 = spark.createDataFrame(rows[:-1],
                                "item long, rater string, correct int")
    assert not cochrans_q(df2, "item", "rater", "correct") \
        .collect()[0]["complete_design"]


# ------------------------------------------------ Wilcoxon signed-rank


def test_wilcoxon_midranks_and_parity(spark):
    """Textbook midranks: diffs [1,-1,2,2,3,0] -> W+ = 13.5, W- = 1.5
    (milli 13500/1500), zero dropped, total = 500*n*(n+1)."""
    from gis_city_county_spark.operators.mlprep import (
        wilcoxon_signed_rank,
        wilcoxon_signed_rank_sql,
    )

    rows = [(10, 9), (9, 10), (12, 10), (22, 20), (13, 10), (5, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = wilcoxon_signed_rank(df, "a", "b").collect()[0]
    assert out["n_nonzero"] == 5
    assert out["w_plus_milli"] == 13_500
    assert out["w_minus_milli"] == 1_500
    assert out["ranks_total_milli"] == 500 * 5 * 6
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        wilcoxon_signed_rank_sql("SELECT * FROM t", "a", "b")
    ).fetchall()[0]
    assert tuple(out) == want


# --------------------------------------------------- permutation test


def test_permutation_test_determinism_and_parity(spark):
    """Same replicas on every run/engine; a null effect (all-zero
    diffs) yields p = 1e6; a huge one-sided effect yields a small p."""
    from gis_city_county_spark.operators.mlprep import (
        permutation_test,
        permutation_test_sql,
    )

    rows = [(i, 100 + i, i) for i in range(1, 21)]  # d_i = 100 each
    df = spark.createDataFrame(rows, "k long, a long, b long")
    out1 = permutation_test(df, "k", "a", "b", n_replicas=64).collect()[0]
    out2 = permutation_test(df, "k", "a", "b", n_replicas=64).collect()[0]
    assert tuple(out1) == tuple(out2)
    assert out1["observed_stat"] == 2000
    assert out1["p_value_ppm"] <= 200_000  # constant +100 shift: strong
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.execute(
        permutation_test_sql("SELECT * FROM t", "k", "a", "b",
                             n_replicas=64)
    ).fetchall()[0]
    assert tuple(out1) == want
    zero = spark.createDataFrame([(i, 5, 5) for i in range(10)],
                                 "k long, a long, b long")
    z = permutation_test(zero, "k", "a", "b", n_replicas=16).collect()[0]
    assert z["p_value_ppm"] == 1_000_000


# --------------------------------------------------------- Wilson CI


def test_wilson_ci_reference_and_parity(spark):
    """Bit-matches the fixed-order Python evaluation of the same
    formula, brackets p-hat, stays inside [0, 1], and bit-matches
    DuckDB."""
    import math

    from gis_city_county_spark.operators.mlprep import (
        wilson_ci,
        wilson_ci_sql,
    )

    rows = [("g1", 1)] * 8 + [("g1", 0)] * 2 + [("g2", 0)] * 5 + [("g2", 1)]
    df = spark.createDataFrame(rows, "g string, s int")
    out = {r["g"]: r for r in wilson_ci(df, "g", "s").collect()}

    def ref(s, n):
        z = 1960 / 1000.0
        p = float(s) / float(n)
        z2 = z * z
        center = p + z2 / (2.0 * n)
        half = z * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
        denom = 1.0 + z2 / n
        return (center - half) / denom, (center + half) / denom

    lo, hi = ref(8, 10)
    assert out["g1"]["wilson_lo"] == lo and out["g1"]["wilson_hi"] == hi
    for g, (s, n) in {"g1": (8, 10), "g2": (1, 6)}.items():
        r = out[g]
        assert 0.0 <= r["wilson_lo"] < s / n < r["wilson_hi"] <= 1.0
        assert r["p_hat_ppm"] == s * 1_000_000 // n
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, s INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(tuple(r) for r in wilson_ci(df, "g", "s").collect())
    want = sorted(tuple(r) for r in con.execute(
        wilson_ci_sql("SELECT * FROM t", "g", "s")).fetchall())
    assert got == want


# ----------------------------------------------------- script profile


def test_script_profile_exact_counts_and_parity(spark):
    """Mixed-script fixture: exact per-class char counts in ppm, the
    other-remainder identity, and DuckDB parity (the class patterns
    are literal codepoints, so Java regex and RE2 agree)."""
    from gis_city_county_spark.operators.textstats import (
        script_profile,
        script_profile_sql,
    )

    rows = [
        (1, "en", "Abc 123"),           # 3 latin, 3 digit, 1 space
        (2, "ru", "Привет мир"),        # 9 cyrillic, 1 space
        (3, "zh", "中文 ok"),            # 2 cjk, 2 latin, 1 space
        (4, "el", "αβγ!"),              # 3 greek, 1 other
    ]
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    out = {r["lang"]: r for r in
           script_profile(df, "lang", "text").collect()}
    en = out["en"]
    assert en["n_chars"] == 7
    assert en["latin_ppm"] == 3_000_000 // 7
    assert en["digit_ppm"] == 3_000_000 // 7
    assert en["space_ppm"] == 1_000_000 // 7
    assert out["ru"]["cyrillic_ppm"] == 9_000_000 // 10
    assert out["zh"]["cjk_ppm"] == 2_000_000 // 5
    assert out["el"]["greek_ppm"] == 3_000_000 // 4
    assert out["el"]["other_ppm"] == 1_000_000 // 4
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = sorted(tuple(r) for r in script_profile(df, "lang", "text").collect())
    want = sorted(tuple(r) for r in con.execute(
        script_profile_sql("t", "lang", "text")).fetchall())
    assert got == want


# ----------------------------------------------------- n-gram novelty


def test_ngram_novelty_ownership_and_parity(spark):
    """The lowest doc_id owns each shingle: d1 fully novel, d2 novel
    only where it diverges; short docs drop."""
    from gis_city_county_spark.operators.textstats import (
        ngram_novelty,
        ngram_novelty_sql,
    )

    rows = [
        (1, "a b c d e"),
        (2, "a b c x y"),
        (3, "a b"),          # < k tokens: no shingles, drops
        (4, "a b c d e"),    # exact dup of 1: zero novel
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           ngram_novelty(df, "doc_id", "text").collect()}
    assert 3 not in out
    assert out[1]["n_shingles"] == 3 and out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["n_shingles"] == 3 and out[2]["n_novel"] == 2
    assert out[2]["novelty_ppm"] == 2_000_000 // 3
    assert out[4]["n_novel"] == 0 and out[4]["novelty_ppm"] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(tuple(r) for r in ngram_novelty(df, "doc_id", "text").collect())
    want = sorted(tuple(r) for r in con.execute(
        ngram_novelty_sql("t", "doc_id", "text")).fetchall())
    assert got == want


# ------------------------------------------------------ split leakage


def test_split_leakage_audit_identities_and_parity(spark):
    """Every reported group sits in >= 2 splits, per-split counts
    crossfoot to n_docs, single-split groups stay out, and the md5
    assignment makes Spark and DuckDB agree exactly."""
    from gis_city_county_spark.operators.corpus import (
        split_leakage_audit,
        split_leakage_audit_sql,
    )

    # 40 docs in one big group guarantee it spans splits; 1-doc
    # groups can never leak.
    rows = [(i, "big") for i in range(40)] + [(100, "solo"), (101, "solo2")]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = split_leakage_audit(df, "doc_id", "src").collect()
    by_g = {r["src"]: r for r in out}
    assert "big" in by_g and "solo" not in by_g and "solo2" not in by_g
    for r in out:
        assert r["n_splits"] >= 2
        assert r["n_train"] + r["n_val"] + r["n_test"] == r["n_docs"]
        assert len(r["splits"].split(",")) == r["n_splits"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, src VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(tuple(r) for r in out)
    want = sorted(tuple(r) for r in con.execute(
        split_leakage_audit_sql("t", "doc_id", "src")).fetchall())
    assert got == want


# -------------------------------------------------------- Y4M video


def test_y4m_roundtrip_and_validation():
    """encode→decode is exact; malformed payloads raise."""
    import numpy as np
    import pytest

    from gis_city_county_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(5, 6, 9), dtype=np.uint8)
    payload = encode_y4m(frames, fps=(30, 1))
    back, fps = decode_y4m(payload)
    assert fps == (30, 1)
    assert (back == frames).all()
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a y4m")
    with pytest.raises(ValueError):
        decode_y4m(payload[:-10])  # truncated final frame
    with pytest.raises(ValueError):
        decode_y4m(payload.replace(b"Cmono", b"C420 "))


def test_video_frame_stats_exact_and_cuts(spark):
    """Sampled-frame stats equal the numpy ground truth exactly; the
    crafted +80 luma jump is the only detected cut per clip."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import (
        encode_y4m,
        video_frame_stats,
        video_scene_cuts,
    )

    y, x = np.ogrid[0:8, 0:8]
    vids = {}
    rows = []
    for v in range(3):
        frames = np.stack(
            [(v * 13 + f * 9 + (80 if f >= 8 else 0) + 2 * y + x)
             .astype(np.uint8) for f in range(12)]
        )
        vids[v] = frames
        rows.append((v, bytearray(encode_y4m(frames))))
    df = spark.createDataFrame(rows, "vid_id long, payload binary")
    stats = video_frame_stats(df, "vid_id", "payload", every=2)
    got = {(r["id"], r["frame_idx"]): r for r in stats.collect()}
    assert len(got) == 3 * 6
    for (v, f), r in got.items():
        fr = vids[v][f].astype(np.int64)
        assert r["n_frames"] == 12
        assert r["mean_luma_milli"] == 1000 * int(fr.sum()) // 64
        assert r["min_luma"] == int(fr.min())
        assert r["max_luma"] == int(fr.max())
    cuts = video_scene_cuts(stats, threshold_milli=40_000).collect()
    assert len(cuts) == 3
    for c in cuts:
        assert (c["prev_idx"], c["frame_idx"]) == (6, 8)
        assert c["delta_milli"] == 98_000  # 2 frames x 9 + 80 jump


# ------------------------------------------------------ recall audit


def test_lsh_recall_audit_perfect_on_identical_bands(spark):
    """A corpus where each probe's true neighbors share its exact
    vector (same bands by construction) must audit at recall 1e6;
    totals crossfoot."""
    import numpy as np

    from gis_city_county_spark.operators.similarity import lsh_recall_audit

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 64))
    rows = []
    rid = 0
    for c in range(4):
        for _ in range(6):
            rows.append((rid * 50, [float(v) for v in base[c]]))
            rid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lsh_recall_audit(df, "vec_id", "embedding",
                           probe_mod=50, k=5).collect()[0]
    assert out["n_probes"] == 24
    assert out["n_exact_pairs"] == 24 * 5
    assert out["n_hit_pairs"] == out["n_exact_pairs"]
    assert out["recall_ppm"] == 1_000_000


# --------------------------------------------------- Mann-Kendall


def test_trend_test_reference_and_parity(spark):
    """Strictly rising volume: S = C(n,2), zero tie correction,
    var18 = n(n-1)(2n+5), z from the closed form, Sen slope exactly
    the common difference; bit parity with DuckDB."""
    import math

    from gis_city_county_spark.operators.temporal import (
        trend_test,
        trend_test_sql,
    )

    rows = []
    for i, (day, n) in enumerate(
        [("2024-03-01", 1), ("2024-03-02", 2),
         ("2024-03-03", 3), ("2024-03-04", 4)]
    ):
        rows += [(day,)] * n
    df = spark.createDataFrame(rows, "d string").select(
        F.col("d").cast("timestamp").alias("ts")
    )
    out = trend_test(df, "ts").collect()[0]
    assert out["n_days"] == 4
    assert out["s_statistic"] == 6  # all 6 pairs rising
    assert out["var18"] == 4 * 3 * 13
    assert out["z_score"] == (6.0 - 1.0) / math.sqrt((4 * 3 * 13) / 18.0)
    assert out["sen_slope_milli"] == 1000
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?)",
                    [(d + " 12:00:00",) for (d,) in rows])
    want = con.execute(
        trend_test_sql("SELECT * FROM ev", "ts")).fetchall()[0]
    assert tuple(out) == want


def test_trend_test_falling_and_ties(spark):
    """A falling series flips the sign (negative Sen slope agrees
    across engines despite the floor-division asymmetry); tied days
    shrink var18 by the textbook correction."""
    from gis_city_county_spark.operators.temporal import (
        trend_test,
        trend_test_sql,
    )

    rows = []
    for day, n in [("2024-03-01", 5), ("2024-03-02", 5),
                   ("2024-03-03", 2), ("2024-03-04", 1)]:
        rows += [(day,)] * n
    df = spark.createDataFrame(rows, "d string").select(
        F.col("d").cast("timestamp").alias("ts")
    )
    out = trend_test(df, "ts").collect()[0]
    assert out["s_statistic"] == -5  # one tied pair contributes 0
    assert out["var18"] == 4 * 3 * 13 - 2 * 1 * 9  # one t=2 group
    assert out["sen_slope_milli"] < 0
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?)",
                    [(d + " 12:00:00",) for (d,) in rows])
    want = con.execute(
        trend_test_sql("SELECT * FROM ev", "ts")).fetchall()[0]
    assert tuple(out) == want


# ------------------------------------------------------- lift table


def test_lift_table_identities_and_parity(spark):
    """Top-scored positives: band 1 captures everything, identities
    crossfoot (Σn_rows = n, final cum_pos = total positives, final
    capture = 1e6, uniform-band lift = capture-rate · n/pos)."""
    from gis_city_county_spark.operators.mlprep import (
        lift_table,
        lift_table_sql,
    )

    rows = [(i, 100 - i, 1 if i < 4 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, s long, y int")
    out = sorted(lift_table(df, "k", "s", "y").collect(),
                 key=lambda r: r["band"])
    assert [r["band"] for r in out] == list(range(1, 11))
    assert sum(r["n_rows"] for r in out) == 20
    assert out[-1]["cum_pos"] == 4 and out[-1]["capture_ppm"] == 1_000_000
    assert out[0]["n_pos"] == 2 and out[0]["response_ppm"] == 1_000_000
    assert out[0]["lift_ppm"] == 5_000_000  # 100% response vs 20% base
    assert out[2]["n_pos"] == 0 and out[2]["lift_ppm"] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, s BIGINT, y INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = sorted(tuple(r) for r in lift_table(df, "k", "s", "y").collect())
    want = sorted(tuple(r) for r in con.execute(
        lift_table_sql("SELECT * FROM t", "k", "s", "y")).fetchall())
    assert got == want


# ------------------------------------------------------ Heaps curve


def test_heaps_curve_first_positions_and_parity(spark):
    """Global positions follow doc_id order: vocab at checkpoint 1/2/
    total is exactly the first-occurrence census; exact duplicate
    docs add tokens but no vocabulary."""
    from gis_city_county_spark.operators.corpus import (
        heaps_curve,
        heaps_curve_sql,
    )

    rows = [(1, "a b"), (2, "a c"), (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["checkpoint"]: r["vocab_seen"]
           for r in heaps_curve(df, "doc_id", "text").collect()}
    # positions: a=1, b=2 (doc1); a=3, c=4 (doc2); doc3 adds nothing.
    assert out == {1: 1, 2: 2, 4: 3, 6: 3}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(tuple(r) for r in
                 heaps_curve(df, "doc_id", "text").collect())
    want = sorted(tuple(r) for r in con.execute(
        heaps_curve_sql("t", "doc_id", "text")).fetchall())
    assert got == want


# ---------------------------------------------------- mixed script


def test_mixed_script_tokens_fixture_and_parity(spark):
    """The Cyrillic-а 'pаypal' spoof counts as mixed; pure-script
    tokens don't; exact ppm; DuckDB parity (literal-codepoint
    classes)."""
    from gis_city_county_spark.operators.textstats import (
        mixed_script_tokens,
        mixed_script_tokens_sql,
    )

    rows = [
        (1, "en", "login to pаypal now"),     # 1 mixed of 4
        (2, "ru", "привет мир"),              # 0 mixed of 2
        (3, "el", "alphaβeta ok"),            # greek+latin mix
        (4, "en", "all clean tokens here"),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    out = {r["lang"]: r for r in
           mixed_script_tokens(df, "lang", "text").collect()}
    assert out["en"]["n_tokens"] == 8 and out["en"]["n_mixed"] == 1
    assert out["en"]["mixed_ppm"] == 1_000_000 // 8
    assert out["ru"]["n_mixed"] == 0
    assert out["el"]["n_mixed"] == 1
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = sorted(tuple(r) for r in
                 mixed_script_tokens(df, "lang", "text").collect())
    want = sorted(tuple(r) for r in con.execute(
        mixed_script_tokens_sql("t", "lang", "text")).fetchall())
    assert got == want


# ----------------------------------------------------------- KS test


def test_ks_test_exact_gap_and_parity(spark):
    """Hand-checkable ECDF gap: side 0 = {1,2,3,4}, side 1 = {3,4,5,6}
    -> max gap 1/2 at value 2; exact ppm; DuckDB parity; identical
    samples -> D = 0."""
    from gis_city_county_spark.operators.mlprep import ks_test, ks_test_sql

    rows = [(0, v) for v in (1, 2, 3, 4)] + [(1, v) for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "side int, v long")
    out = ks_test(df, "side", "v").collect()[0]
    assert out["n_a"] == 4 and out["n_b"] == 4 and out["n_cells"] == 6
    assert out["d_ppm"] == 500_000 and out["at_value"] == 2
    con = duckdb.connect()
    con.execute("CREATE TABLE t (side INTEGER, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        ks_test_sql("SELECT * FROM t", "side", "v")).fetchall()[0]
    assert tuple(out) == want
    same = spark.createDataFrame(
        [(s, v) for s in (0, 1) for v in (1, 2, 3)], "side int, v long"
    )
    z = ks_test(same, "side", "v").collect()[0]
    assert z["d_ppm"] == 0


# -------------------------------------------------- seasonal naive


def test_seasonal_naive_backtest_exact_and_parity(spark):
    """period=2 over counts [1,2,3,4]: forecasts [1,2] score days
    3-4 with errors |3-1|+|4-2| = 4; WAPE = 4/7; MAE = 2.0."""
    from gis_city_county_spark.operators.temporal import (
        seasonal_naive_backtest,
        seasonal_naive_backtest_sql,
    )

    rows = []
    for day, n in [("2024-03-01", 1), ("2024-03-02", 2),
                   ("2024-03-03", 3), ("2024-03-04", 4)]:
        rows += [(day,)] * n
    df = spark.createDataFrame(rows, "d string").select(
        F.col("d").cast("timestamp").alias("ts")
    )
    out = seasonal_naive_backtest(df, "ts", period_days=2).collect()[0]
    assert out["n_days_scored"] == 2
    assert out["total_actual"] == 7
    assert out["total_abs_err"] == 4
    assert out["wape_ppm"] == 4_000_000 // 7
    assert out["mae_milli"] == 2_000
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (ts TIMESTAMP)")
    con.executemany("INSERT INTO ev VALUES (?)",
                    [(d + " 12:00:00",) for (d,) in rows])
    want = con.execute(seasonal_naive_backtest_sql(
        "SELECT * FROM ev", "ts", period_days=2)).fetchall()[0]
    assert tuple(out) == want


# ------------------------------------------------------ SMD balance


def test_smd_balance_reference_and_parity(spark):
    """Bit-matches the fixed-order Python evaluation on exact milli
    moments; balanced arms -> SMD 0; a shifted arm -> positive SMD;
    DuckDB parity."""
    import math

    from gis_city_county_spark.operators.mlprep import (
        smd_balance,
        smd_balance_sql,
    )

    rows = [
        (0, 10.0, 5.0), (0, 12.0, 5.0), (0, 14.0, 5.0),
        (1, 16.0, 5.0), (1, 18.0, 5.0), (1, 20.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "arm int, a double, b double")
    out = {r["metric"]: r for r in
           smd_balance(df, "arm", ["a", "b"]).collect()}

    def ref(vals_c, vals_t):
        mc = sum(math.floor(v * 1000) for v in vals_c) / len(vals_c)
        mt = sum(math.floor(v * 1000) for v in vals_t) / len(vals_t)
        qc = sum(math.floor(v * 1000) ** 2 for v in vals_c) / len(vals_c)
        qt = sum(math.floor(v * 1000) ** 2 for v in vals_t) / len(vals_t)
        vc, vt = qc - mc * mc, qt - mt * mt
        return (mt - mc) / math.sqrt((vc + vt) / 2.0)

    assert out["a"]["smd"] == ref([10, 12, 14], [16, 18, 20])
    assert out["a"]["mean_c"] == 12.0 and out["a"]["mean_t"] == 18.0
    assert out["b"]["smd"] == 0.0  # constant covariate: degenerate -> 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t (arm INTEGER, a DOUBLE, b DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = sorted(tuple(r) for r in
                 smd_balance(df, "arm", ["a", "b"]).collect())
    want = sorted(tuple(r) for r in con.execute(
        smd_balance_sql("SELECT * FROM t", "arm", ["a", "b"])).fetchall())
    assert got == want


# --------------------------------------------------- Bradley-Terry


def test_bradley_terry_ordering_identity_and_parity(spark):
    """Dominant item gets the top strength, strengths order by true
    win rates, Σ strength ≈ k·scale (the per-round normalization),
    and the integer MM iteration is BIT-IDENTICAL on DuckDB."""
    from gis_city_county_spark.operators.mlprep import (
        bradley_terry,
        bradley_terry_sql,
    )

    rows = ([("a", "b")] * 8 + [("b", "a")] * 2 + [("b", "c")] * 6
            + [("c", "b")] * 4 + [("a", "c")] * 9 + [("c", "a")] * 1)
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = bradley_terry(df, "winner", "loser", rounds=10).collect()
    assert [r["item"] for r in out] == ["a", "b", "c"]
    assert out[0]["n_wins"] == 17 and out[0]["n_contests"] == 20
    total = sum(r["strength"] for r in out)
    assert abs(total - 3 * 1_000_000) <= 3  # floor dust only
    assert out[0]["max_delta"] == out[1]["max_delta"]  # one scalar
    con = duckdb.connect()
    con.execute("CREATE TABLE t (winner VARCHAR, loser VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(
        bradley_terry_sql("SELECT * FROM t", "winner", "loser", rounds=10)
    ).fetchall()
    assert [tuple(r) for r in out] == want


def test_bradley_terry_symmetric_and_zero_wins(spark):
    """A perfectly balanced pair converges to equal strengths; a
    never-winning item reports strength 0 (the documented
    connectivity caveat), not an error."""
    from gis_city_county_spark.operators.mlprep import bradley_terry

    bal = spark.createDataFrame(
        [("x", "y")] * 5 + [("y", "x")] * 5, "winner string, loser string"
    )
    out = {r["item"]: r for r in
           bradley_terry(bal, "winner", "loser", rounds=6).collect()}
    assert out["x"]["strength"] == out["y"]["strength"]

    lop = spark.createDataFrame(
        [("x", "z")] * 4 + [("y", "z")] * 4 + [("x", "y")] * 2
        + [("y", "x")] * 2,
        "winner string, loser string",
    )
    res = {r["item"]: r for r in
           bradley_terry(lop, "winner", "loser", rounds=6).collect()}
    assert res["z"]["strength"] == 0 and res["z"]["n_wins"] == 0
    assert res["x"]["strength"] > 0 and res["y"]["strength"] > 0


# ----------------------------------------------- tokenizer fertility


def test_tokenizer_fertility_exact_and_parity(spark):
    """Whitespace words vs BPE-regex tokens: contractions and
    punctuation inflate fertility exactly as counted; parity with
    DuckDB.  Round 12 consolidated the short-lived corpus variant
    into the round-5 textstats operator, which now also carries the
    chars_per_token_milli column this test pins."""
    from gis_city_county_spark.operators.textstats import (
        tokenizer_fertility,
        tokenizer_fertility_sql,
    )

    rows = [
        (1, "en", "don't stop now"),   # 3 words -> don 't stop now = 4
        (2, "en", "plain words here"),  # 3 -> 3
        (3, "xx", "a,b,c"),             # 1 word -> a , b , c = 5
    ]
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    out = {r["lang"]: r for r in
           tokenizer_fertility(df, "lang", "text").collect()}
    en = out["en"]
    assert en["n_words"] == 6 and en["n_subwords"] == 7
    assert en["fertility_ppm"] == 7_000_000 // 6
    assert en["n_chars"] == len("don't stop now") + len("plain words here")
    assert en["chars_per_token_milli"] == en["n_chars"] * 1000 // 7
    xx = out["xx"]
    assert xx["n_words"] == 1 and xx["n_subwords"] == 5
    assert xx["fertility_ppm"] == 5_000_000
    assert xx["chars_per_token_milli"] == 5 * 1000 // 5
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = sorted(tuple(r) for r in
                 tokenizer_fertility(df, "lang", "text").collect())
    want = sorted(tuple(r) for r in con.execute(
        tokenizer_fertility_sql("t", "lang", "text")).fetchall())
    assert got == want
