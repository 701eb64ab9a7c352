"""Round-10 operator additions: winnowing fingerprints, Kendall
tau-b, Cramér's V, the hashing trick, the churn hazard life table,
MAD daily anomalies, and the perceptual image dHash.

Each operator gets (a) a hand-checkable exact fixture and (b) a
Spark-vs-DuckDB twin comparison; the suite-wide
``test_suite_vs_duckdb`` additionally hash-checks every registered
QuerySpec at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------- winnowing


def test_winnowing_guarantee_and_parity(spark):
    """The winnowing guarantee: two documents sharing a run of
    w + k - 1 = 7 tokens share at least one fingerprint; disjoint
    documents share none; an exact duplicate shares everything."""
    from gis_city_county_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_fingerprints_sql,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "prefix words then the quick brown fox jumps over the rest"),
        (3, "nothing in common here at all whatsoever plainly unique"),
        (4, "too short"),
        (5, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           winnowing_fingerprints(df, "doc_id", "text").collect()}
    assert 4 not in out  # below k + w - 1 tokens: no full window
    assert out[1]["shared_ppm"] == 1_000_000  # exact dup of 5
    assert out[5]["shared_ppm"] == 1_000_000
    assert out[2]["n_shared_fp"] >= 1  # 7-token overlap guarantee
    assert out[3]["n_shared_fp"] == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(
            winnowing_fingerprints_sql("t", "doc_id", "text")
        ).fetchall()
    )
    got = sorted(
        tuple(r) for r in
        winnowing_fingerprints(df, "doc_id", "text").collect()
    )
    assert got == want


def test_winnowing_density(spark):
    """Winnowing selects ~2/(w+1) of the shingles — on a long random
    document the fingerprint density must land well below 1 and the
    count below the shingle count."""
    import random

    rnd = random.Random(4)
    words = " ".join(
        rnd.choice(["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"])
        + str(rnd.randint(0, 99))
        for _ in range(400)
    )
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    from gis_city_county_spark.operators.dedup import winnowing_fingerprints

    r = winnowing_fingerprints(df, "doc_id", "text").collect()[0]
    assert r["n_shingles"] == 397
    # expected density 2/(w+1) = 0.4; allow generous slack
    assert 0.2 * 397 < r["n_fingerprints"] < 0.6 * 397


# ----------------------------------------------------- kendall tau


def test_kendall_tau_exact_small(spark):
    """Textbook check against a brute-force O(n²) pair count with
    ties in both variables."""
    rows = [(1, 2), (2, 2), (2, 3), (3, 1), (4, 4), (4, 4), (5, 5)]
    from gis_city_county_spark.operators.mlprep import kendall_tau

    r = kendall_tau(
        spark.createDataFrame(rows, "x int, y int"), "x", "y"
    ).collect()[0]
    # brute force
    C = D = 0
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            s = (rows[i][0] - rows[j][0]) * (rows[i][1] - rows[j][1])
            C += s > 0
            D += s < 0
    assert (r["concordant"], r["discordant"]) == (C, D)
    from collections import Counter
    import math

    n0 = n * (n - 1) // 2
    n1 = sum(c * (c - 1) // 2 for c in Counter(x for x, _ in rows).values())
    n2 = sum(c * (c - 1) // 2 for c in Counter(y for _, y in rows).values())
    assert r["ties_x_pairs"] == n1 and r["ties_y_pairs"] == n2
    assert r["tau_b"] == pytest.approx(
        (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
    )


def test_kendall_tau_constant_variable_null(spark):
    from gis_city_county_spark.operators.mlprep import kendall_tau

    df = spark.createDataFrame([(1, 1), (1, 2), (1, 3)], "x int, y int")
    r = kendall_tau(df, "x", "y").collect()[0]
    assert r["tau_b"] is None and r["concordant"] == 0


def test_kendall_tau_matches_duckdb(spark):
    import random

    from gis_city_county_spark.operators.mlprep import (
        kendall_tau,
        kendall_tau_sql,
    )

    rnd = random.Random(9)
    rows = [(rnd.randint(0, 6), rnd.randint(0, 4)) for _ in range(300)]
    rows += [(None, 1), (2, None)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = tuple(kendall_tau(df, "x", "y").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x INT, y INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(kendall_tau_sql("SELECT * FROM t", "x", "y")).fetchall()[0]
    assert got == want


# ------------------------------------------------------- cramers v


def test_cramers_v_perfect_association(spark):
    """A bijective 3×3 table is perfect association: V = 1."""
    from gis_city_county_spark.operators.mlprep import cramers_v

    rows = [(c, c.upper()) for c in "abc" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)


def test_cramers_v_independence_near_zero(spark):
    """A perfectly balanced product table has χ² = 0 exactly."""
    from gis_city_county_spark.operators.mlprep import cramers_v

    rows = [(a, b) for a in "ab" for b in "xyz" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["phi2_pico"] == 0 and r["cramers_v"] == 0.0


def test_cramers_v_constant_variable_null(spark):
    from gis_city_county_spark.operators.mlprep import cramers_v

    df = spark.createDataFrame([("a", "x"), ("a", "y")], "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["cramers_v"] is None


def test_cramers_v_matches_duckdb(spark):
    import random

    from gis_city_county_spark.operators.mlprep import (
        cramers_v,
        cramers_v_sql,
    )

    rnd = random.Random(2)
    rows = [
        (rnd.choice("abcd"), rnd.choice("wxyz")) for _ in range(500)
    ] + [(None, "w"), ("a", None)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = tuple(cramers_v(df, "a", "b").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(cramers_v_sql("SELECT * FROM t", "a", "b")).fetchall()[0]
    assert got == want


# -------------------------------------------------- feature hashing


def test_hashed_features_sign_cancellation_and_parity(spark):
    """Feature rows carry both the signed sum and the raw occurrence
    count; repeated tokens accumulate; engines agree exactly."""
    from gis_city_county_spark.operators.mlprep import (
        hashed_features,
        hashed_features_sql,
    )

    rows = [(1, "w1 w1 w2"), (2, "w3"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = hashed_features(df, "doc_id", "text", n_buckets=16)
    got = sorted(tuple(r) for r in feats.collect())
    assert all(abs(sc) <= nt for _, _, sc, nt in got)
    assert sum(nt for _, _, _, nt in got) == 4  # total token occurrences
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r) for r in con.execute(
            hashed_features_sql("SELECT * FROM t", "doc_id", "text", 16)
        ).fetchall()
    )
    assert got == want


def test_feature_hash_audit_crossfoots(spark):
    """Occupancy histogram sums to the configured bucket count and
    occurrence totals cross-foot to the corpus token count."""
    from gis_city_county_spark.operators.mlprep import (
        feature_hash_collision_audit,
    )

    rows = [(1, "a b c d e f g h"), (2, "a a b x y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hist = [tuple(r) for r in
            feature_hash_collision_audit(df, "text", n_buckets=32).collect()]
    assert sum(h[1] for h in hist) == 32
    assert sum(h[2] for h in hist) == 14
    assert hist[0][0] == 0  # the empty-bucket row is always present


# ------------------------------------------------------ hazard table


def test_hazard_table_life_table_identities(spark):
    """at_risk is the suffix sum of cohort exits; churned + censored
    cross-foot; hazard is the exact ppm ratio."""
    from gis_city_county_spark.operators.temporal import hazard_table

    rows = [
        (1, "2024-01-01"), (1, "2024-01-04"),   # t=3, churned
        (2, "2024-01-02"),                        # t=0, churned
        (3, "2024-01-10"), (3, "2024-01-28"),   # t=18, censored (horizon)
        (4, "2024-01-25"), (4, "2024-01-28"),   # t=3, censored
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").select(
        "user_id", F.col("d").cast("timestamp").alias("ts")
    )
    out = {r["day_index"]: r for r in
           hazard_table(df, "user_id", "ts", churn_gap_days=7).collect()}
    assert out[0]["n_at_risk"] == 4
    assert out[0]["n_churned"] == 1 and out[0]["hazard_ppm"] == 250_000
    assert out[3]["n_at_risk"] == 3
    assert out[3]["n_churned"] == 1 and out[3]["n_censored"] == 1
    assert out[3]["hazard_ppm"] == 333_333
    assert out[18]["n_at_risk"] == 1 and out[18]["n_censored"] == 1
    assert out[18]["hazard_ppm"] == 0


def test_hazard_table_matches_duckdb(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    got = sorted(
        tuple(r) for r in q["events_hazard_table"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(tuple(r) for r in
                  con.execute(o["events_hazard_table"]).fetchall())
    assert got == want and len(got) > 0


# ------------------------------------------------------ MAD anomalies


def test_mad_flags_spike_and_outage(spark):
    import datetime

    from gis_city_county_spark.operators.temporal import daily_mad_anomalies

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for day in range(15):
        n = 300 if day == 4 else (0 if day == 9 else 50 + day % 3)
        for i in range(n):
            rows.append((base + datetime.timedelta(days=day, minutes=i),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["day"].day: r for r in
           daily_mad_anomalies(df, "ts").collect()}
    assert len(out) == 15  # zero-filled calendar, outage day present
    assert out[5]["is_anomaly"] and out[5]["n_events"] == 300
    assert out[10]["is_anomaly"] and out[10]["n_events"] == 0
    normal = [d for d, r in out.items() if d not in (5, 10)]
    assert not any(out[d]["is_anomaly"] for d in normal)


def test_mad_matches_duckdb_on_events(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    got = sorted(
        tuple(r) for r in q["events_mad_anomalies"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(tuple(r) for r in
                  con.execute(o["events_mad_anomalies"]).fetchall())
    assert got == want and len(got) > 0


# ----------------------------------------------------------- dHash


def test_image_dhash_invariances(spark):
    """dHash is invariant to uniform brightness shifts (differences
    survive) and to nearest-neighbor upscaling (the 9×8 grid samples
    the same relative positions); a heavy local edit flips few
    bits."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import (
        encode_bmp,
        image_dhash,
    )

    rng = np.random.default_rng(12)
    img = rng.integers(0, 200, size=(12, 16, 3)).astype(np.uint8)
    brighter = np.clip(img.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    upscaled = img.repeat(2, axis=0).repeat(2, axis=1)
    edited = img.copy()
    edited[0:3, 0:3] = 255
    rows = [
        (0, bytearray(encode_bmp(img))),
        (1, bytearray(encode_bmp(brighter))),
        (2, bytearray(encode_bmp(upscaled))),
        (3, bytearray(encode_bmp(edited))),
    ]
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    out = {r["img_id"]: r for r in
           image_dhash(df, "img_id", "payload").collect()}

    def ham(a, b):
        return (
            bin(out[a]["dhash_hi"] ^ out[b]["dhash_hi"]).count("1")
            + bin(out[a]["dhash_lo"] ^ out[b]["dhash_lo"]).count("1")
        )

    assert ham(0, 1) <= 4       # brightness shift: near-identical
    assert ham(0, 2) <= 4       # 2x nearest-neighbor upscale
    assert 0 < ham(0, 3) <= 16  # local edit flips a few bits only
    assert out[2]["width"] == 32 and out[2]["height"] == 24


def test_dhash_near_pairs_pigeonhole(spark):
    """The banded join must find exactly the brute-force near-pair
    set — including pairs whose differing bits SPLIT ACROSS both
    32-bit halves (the case a 2-band half-match join silently
    misses; the round-11 advisory fix) — and never emit a pair
    beyond the Hamming budget."""
    import itertools

    import pytest

    from gis_city_county_spark.operators.multimodal import (
        dhash_near_pairs,
    )

    rows = [
        (0, 100, 200),
        (1, 100, 201),   # lo differs by 1 bit -> hamming 1
        (2, 100, 200),   # exact dup of 0
        (3, 999, 200),   # hi differs by bit_count(100^999)
        (4, 555, 777),   # unrelated
        (5, 101, 201),   # vs 0: 1 bit in EACH half -> hamming 2,
                         # invisible to the old half-match pigeonhole
        (6, 0x0F, 0x0F000000),  # vs 7: 3 bits in hi + 3 in lo = 6
        (7, 0x00, 0x08000000 | 0x02000000),
    ]
    df = spark.createDataFrame(
        rows, "img_id long, dhash_hi long, dhash_lo long"
    )
    got = [tuple(r) for r in dhash_near_pairs(df, "img_id", 6).collect()]
    expected = sorted(
        (a, b, bin(ahi ^ bhi).count("1") + bin(alo ^ blo).count("1"))
        for (a, ahi, alo), (b, bhi, blo) in itertools.combinations(rows, 2)
        if bin(ahi ^ bhi).count("1") + bin(alo ^ blo).count("1") <= 6
    )
    assert sorted(got) == expected
    assert (0, 5, 2) in expected  # the cross-half pair IS in the set
    with pytest.raises(ValueError):
        dhash_near_pairs(df, "img_id", max_hamming=8, bands=8)
    # A binding bucket cap yields a SUBSET (deterministic md5-rank
    # survivors), never spurious pairs.
    capped = [
        tuple(r)
        for r in dhash_near_pairs(df, "img_id", 6, max_bucket=2).collect()
    ]
    assert set(capped) <= set(expected)


def test_dhash_fixture_queries_match_oracle(spark):
    from gis_city_county_spark.suite.multimodal_q import (
        _DHASH_ORACLE,
        _DHASH_PAIRS_ORACLE,
        q_dhash_near_pairs,
        q_image_dhash,
    )

    con = duckdb.connect()
    got = sorted(tuple(r) for r in q_image_dhash(spark, "").collect())
    want = sorted(tuple(r) for r in con.execute(_DHASH_ORACLE).fetchall())
    assert got == want
    gp = [tuple(r) for r in q_dhash_near_pairs(spark, "").collect()]
    wp = [tuple(r) for r in con.execute(_DHASH_PAIRS_ORACLE).fetchall()]
    assert gp == wp
    assert (0, 1, 0) in gp  # the exact-duplicate pair
    assert any(a == 0 and b == 2 and 0 < h <= 2 for a, b, h in gp)


# ----------------------------------------------- growth accounting


def test_growth_accounting_classification_and_identity(spark):
    """Hand-checkable week classifications, the self-auditing
    identity active(w) = active(w−1) + new + resurrected − churned,
    and churn hindsight stopping at the horizon."""
    from gis_city_county_spark.operators.temporal import growth_accounting

    rows = [
        (1, "2024-01-01"), (1, "2024-01-08"), (1, "2024-01-22"),
        (2, "2024-01-01"),
        (3, "2024-01-08"), (3, "2024-01-15"), (3, "2024-01-22"),
        (None, "2024-01-01"), (4, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").select(
        "user_id", F.col("d").cast("timestamp").alias("ts")
    )
    out = [tuple(r) for r in growth_accounting(df, "user_id", "ts").collect()]
    # (week, active, new, retained, resurrected, churned)
    assert [t[1:] for t in out] == [
        (2, 2, 0, 0, 0),   # w1: users 1,2 new
        (2, 1, 1, 0, 1),   # w2: 3 new, 1 retained, 2 churned
        (1, 0, 1, 0, 1),   # w3: 3 retained, 1 churned (gap week)
        (2, 0, 1, 1, 0),   # w4: 3 retained, 1 resurrected; no hindsight
    ]
    for i in range(1, len(out)):
        assert out[i][1] == out[i - 1][1] + out[i][2] + out[i][4] - out[i][5]


def test_growth_accounting_matches_duckdb(spark):
    from gis_city_county_spark.operators.temporal import (
        growth_accounting,
        growth_accounting_sql,
    )

    import datetime
    import random

    rnd = random.Random(6)
    rows = [
        (rnd.randint(1, 40),
         datetime.datetime(2024, 1, 1)
         + datetime.timedelta(days=rnd.randint(0, 70)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = [tuple(r) for r in growth_accounting(df, "user_id", "ts").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [tuple(r) for r in con.execute(
        growth_accounting_sql("SELECT * FROM t", "user_id", "ts")
    ).fetchall()]
    assert got == want and len(got) > 5


# ------------------------------------------------------ IQR audit


def test_iqr_outlier_audit_exact_quartiles(spark):
    """1..100 in dollars plus two planted extremes (102 values):
    lower-convention quartiles at ranks ceil(105/4)=26 and
    ceil(309/4)=77 of the sorted sequence (−200, 1..100, 500) ⇒
    q1=25.00, q3=76.00, IQR=51.00; fences at −51.50/152.50 ⇒ the
    planted 500.00 and −200.00 are the only outliers."""
    from gis_city_county_spark.operators.mlprep import iqr_outlier_audit

    vals = [float(i) for i in range(1, 101)] + [500.0, -200.0]
    df = spark.createDataFrame([(v,) for v in vals], "y double")
    r = iqr_outlier_audit(df, "y").collect()[0]
    assert r["n"] == 102
    assert r["q1_cents"] == 2500 and r["q3_cents"] == 7600
    assert r["iqr_cents"] == 5100
    assert r["n_low"] == 1 and r["n_high"] == 1
    assert r["outlier_ppm"] == 19_607


def test_iqr_outlier_audit_matches_duckdb(spark):
    import random

    from gis_city_county_spark.operators.mlprep import (
        iqr_outlier_audit,
        iqr_outlier_audit_sql,
    )

    rnd = random.Random(8)
    rows = [(round(rnd.gauss(100, 30), 2),) for _ in range(1000)]
    rows += [(9999.99,), (None,)]
    df = spark.createDataFrame(rows, "y double")
    got = tuple(iqr_outlier_audit(df, "y").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(
        iqr_outlier_audit_sql("SELECT * FROM t", "y")
    ).fetchall()[0]
    assert got == want


# ------------------------------------------------------------ cube


def test_cube_revenue_subtotals_crossfoot(spark, sf_dir):
    """The CUBE's four grouping sets must cross-foot: cell counts sum
    to the grand total once per grouping set, and the grouping id
    separates subtotal NULLs from data."""
    from gis_city_county_spark.suite.tpch_ext import q_cube_revenue

    rows = q_cube_revenue(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    grand = by_gid[3][0]
    assert len(by_gid[3]) == 1
    for gid in (0, 1, 2):
        assert sum(r["n_orders"] for r in by_gid[gid]) == grand["n_orders"]
    assert all(r["priority"] is None for r in by_gid[1])
    assert all(r["status"] is None for r in by_gid[2])


# ----------------------------------------------- audio fingerprints


def test_audio_fingerprint_shift_detection(spark):
    """A clip delayed by exactly two windows must match its source at
    best_offset +2 with the most votes of any pair, and the shared
    landmark hashes must be identical (time-domain peaks shift with
    the audio)."""
    from gis_city_county_spark.suite.multimodal_q import (
        q_audio_fp_matches,
    )

    rows = {(r["a_id"], r["b_id"]): r
            for r in q_audio_fp_matches(spark, "").collect()}
    assert (0, 1) in rows
    best = rows[(0, 1)]
    assert best["best_offset"] == 2
    assert best["best_votes"] == max(r["best_votes"] for r in rows.values())


def test_audio_fingerprint_queries_match_oracle(spark):
    from gis_city_county_spark.suite.multimodal_q import (
        _AUDIO_FP_MATCH_ORACLE,
        _AUDIO_FP_ORACLE,
        q_audio_fingerprints,
        q_audio_fp_matches,
    )

    con = duckdb.connect()
    got = sorted(tuple(r) for r in q_audio_fingerprints(spark, "").collect())
    want = sorted(tuple(r) for r in con.execute(_AUDIO_FP_ORACLE).fetchall())
    assert got == want and len(got) > 200
    gm = [tuple(r) for r in q_audio_fp_matches(spark, "").collect()]
    wm = [tuple(r) for r in con.execute(_AUDIO_FP_MATCH_ORACLE).fetchall()]
    assert gm == wm


def test_audio_fingerprint_matches_no_all_pairs(spark):
    """The matcher pairs clips through the landmark-hash equi-join —
    never a cartesian scan over clip pairs."""
    from gis_city_county_spark.plans.inspect import has_cartesian_or_bnlj
    from gis_city_county_spark.suite.multimodal_q import q_audio_fp_matches

    assert not has_cartesian_or_bnlj(q_audio_fp_matches(spark, ""))


def test_dhash_near_pairs_no_all_pairs(spark):
    """The dHash near-pair search rides the (band_idx, band_val)
    equi-join — never a cartesian scan over image pairs."""
    from gis_city_county_spark.plans.inspect import has_cartesian_or_bnlj
    from gis_city_county_spark.suite.multimodal_q import q_dhash_near_pairs

    assert not has_cartesian_or_bnlj(q_dhash_near_pairs(spark, ""))


# ------------------------------------------------- sentence dedup


def test_sentence_dedup_ratio_fixture(spark):
    """Boilerplate sentence shared by three docs; within-doc repeats
    collapse to distinct; empty docs drop; engines agree."""
    from gis_city_county_spark.operators.textstats import (
        sentence_dedup_ratio,
        sentence_dedup_ratio_sql,
    )

    rows = [
        (1, "Cookies are used here. Welcome to my page! Unique one."),
        (2, "Cookies are used here. Another unique remark?"),
        (3, "Totally fresh content. Nothing borrowed at all"),
        (4, ""),
        (5, "Cookies are used here. Cookies are used here. Welcome to my page!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           sentence_dedup_ratio(df, "doc_id", "text").collect()}
    assert 4 not in out
    assert out[5]["n_sentences"] == 3
    assert out[5]["n_distinct_sentences"] == 2
    assert out[5]["shared_ppm"] == 1_000_000
    assert out[3]["n_shared_sentences"] == 0
    assert out[1]["n_shared_sentences"] == 2  # cookie + welcome lines
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(tuple(r) for r in
                 sentence_dedup_ratio(df, "doc_id", "text").collect())
    want = sorted(tuple(r) for r in con.execute(
        sentence_dedup_ratio_sql("t", "doc_id", "text")
    ).fetchall())
    assert got == want


# -------------------------------------------------- loop detection


def test_loop_detection_periods_and_parity(spark):
    """Known loops at periods 1, 2, 3 (including one longer than the
    inspected tail), non-looping prose at 0, empty docs dropped —
    and bit parity with DuckDB."""
    from gis_city_county_spark.operators.textstats import (
        loop_detection,
        loop_detection_sql,
    )

    rows = [
        (1, "a normal sentence that just ends with the the the the the the"),
        (2, "intro text then sorry about that sorry about that sorry about that"),
        (3, "completely ordinary prose with no repetition at the end"),
        (4, "x y x y x y x y x y x y"),
        (5, ""),
        (6, "one two three " * 30),
        # Docs SHORTER than max_period (8 tokens): sequence(p+1, size)
        # would descend and element_at would throw under ANSI without
        # the per-period size guard — the round-11 advisory fix.
        (7, "hi"),
        (8, "go go"),
        (9, "a b c"),
        (10, "yes yes yes yes yes yes yes yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in loop_detection(df, "doc_id", "text").collect()}
    assert 5 not in out
    assert out[1]["loop_period"] == 1 and out[1]["loop_len"] == 6
    assert out[2]["loop_period"] == 3 and out[2]["loop_len"] == 9
    assert out[3]["loop_period"] == 0 and out[3]["loop_ppm"] == 0
    assert out[4]["loop_period"] == 2 and out[4]["loop_ppm"] == 1_000_000
    assert out[6]["loop_period"] == 3 and out[6]["loop_ppm"] == 1_000_000
    assert out[7]["loop_period"] == 0 and out[7]["loop_ppm"] == 0
    assert out[8]["loop_period"] == 1 and out[8]["loop_ppm"] == 1_000_000
    assert out[9]["loop_period"] == 0 and out[9]["loop_ppm"] == 0
    assert out[10]["loop_period"] == 1 and out[10]["loop_len"] == 8
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(tuple(r) for r in
                 loop_detection(df, "doc_id", "text").collect())
    want = sorted(tuple(r) for r in con.execute(
        loop_detection_sql("t", "doc_id", "text")
    ).fetchall())
    assert got == want


# ------------------------------------------------------------- RBO


def test_rbo_endpoints_and_reference(spark):
    """Identical rankings ~1e6 (minus per-term floor dust), disjoint
    top-k exactly 0, and a correlated case equal to the exact Python
    reference."""
    from gis_city_county_spark.operators.mlprep import rbo_at_k

    ident = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(50)],
        "id long, a double, b double",
    )
    r = rbo_at_k(ident, "id", "a", "b").collect()[0]
    assert r["n_shared_at_k"] == 20 and 999_980 <= r["rbo_micro"] <= 1_000_000
    rev = spark.createDataFrame(
        [(i, float(100 - i), float(i)) for i in range(100)],
        "id long, a double, b double",
    )
    r2 = rbo_at_k(rev, "id", "a", "b").collect()[0]
    assert r2["n_shared_at_k"] == 0 and r2["rbo_micro"] == 0


def test_rbo_matches_duckdb_and_python(spark):
    import random

    from gis_city_county_spark.operators.mlprep import (
        rbo_at_k,
        rbo_at_k_sql,
    )

    rnd = random.Random(5)
    rows = [(i, float(1000 - i), float(1000 - i) + rnd.gauss(0, 8))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    got = tuple(rbo_at_k(df, "id", "a", "b").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, a DOUBLE, b DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = con.execute(
        rbo_at_k_sql("SELECT * FROM t", "id", "a", "b")
    ).fetchall()[0]
    assert got == want
    # exact Python reference over the same rankings
    k = 20
    ra = sorted(rows, key=lambda r: (-r[1], r[0]))[:k]
    rb = sorted(rows, key=lambda r: (-r[2], r[0]))[:k]
    sa = [r[0] for r in ra]
    sb = [r[0] for r in rb]
    ref = sum(
        (len(set(sa[:d]) & set(sb[:d])) * 10**6) // (d * 2**d)
        for d in range(1, k + 1)
    )
    assert got[2] == ref


# ------------------------------------------------- apportionment


def test_apportioned_release_sums_to_budget_exactly(spark):
    """The Hamilton identity: released counts sum to the budget for
    awkward distributions where independent rounding misses (three
    equal thirds at budget 100 → 34/33/33, not 33/33/33)."""
    from gis_city_county_spark.operators.privacy import apportioned_release

    rows = [("a",)] * 10 + [("b",)] * 10 + [("c",)] * 10
    df = spark.createDataFrame(rows, "cat string")
    out = {r["category"]: r["n_released"] for r in
           apportioned_release(df, "cat", total_budget=100).collect()}
    assert sum(out.values()) == 100
    assert out == {"a": 34, "b": 33, "c": 33}  # tie → category order


def test_apportioned_release_matches_duckdb(spark):
    import random

    from gis_city_county_spark.operators.privacy import (
        apportioned_release,
        apportioned_release_sql,
    )

    rnd = random.Random(13)
    rows = [(rnd.choice("abcdefg"),) for _ in range(777)] + [(None,)]
    df = spark.createDataFrame(rows, "cat string")
    got = sorted(tuple(r) for r in
                 apportioned_release(df, "cat", 1000).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (cat VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        apportioned_release_sql("SELECT * FROM t", "cat", 1000)
    ).fetchall())
    assert got == want
    assert sum(r[2] for r in got) == 1000
