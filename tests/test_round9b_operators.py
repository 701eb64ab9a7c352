"""Round-9 second-wave operators: AMS F2, deterministic DP release,
one-pass correlation matrix (and later additions this round)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


# ----------------------------------------------------------- ams_f2


def test_ams_f2_exact_audit_and_bounds(spark):
    """Known distribution: counts (3,2,1) → F2 = 9+4+1 = 14, 3 keys.
    The estimate is deterministic (hash-seeded) and its mean over
    signs is F2-unbiased in expectation; here we pin the exact audit
    and the determinism across two independent builds."""
    from gis_city_county_spark.operators.sketch import ams_f2

    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], "v string"
    )
    r1 = ams_f2(df, "v", n_seeds=16).collect()[0]
    r2 = ams_f2(df, "v", n_seeds=16).collect()[0]
    assert r1 == r2  # deterministic: same input, same sketch
    assert r1["n_keys"] == 3 and r1["f2_exact"] == 14.0
    # X_s ∈ [-6, 6] ⇒ X² ≤ 36 ⇒ the floor-mean is bounded
    assert 0 <= r1["f2_estimate"] <= 36


def test_ams_f2_all_distinct_has_exact_f2_n(spark):
    """Every value unique ⇒ F2 = n exactly; the estimate concentrates
    near n (signs cancel in the cross terms only in expectation, so
    just assert the audit and the err_ppm consistency)."""
    from gis_city_county_spark.operators.sketch import ams_f2

    df = spark.createDataFrame([(i,) for i in range(200)], "v long")
    r = ams_f2(df, "v", n_seeds=32).collect()[0]
    assert r["n_keys"] == 200 and r["f2_exact"] == 200.0
    import math

    assert r["err_ppm"] == math.floor(
        (r["f2_estimate"] - r["f2_exact"]) / r["f2_exact"] * 1_000_000
    )


def test_ams_f2_matches_duckdb_on_events(spark, sf_dir):
    from gis_city_county_spark.operators.sketch import ams_f2, ams_f2_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = [tuple(r) for r in ams_f2(ev, "user_id").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            ams_f2_sql("SELECT * FROM events", "user_id")
        ).fetchall()
    ]
    assert got == want and len(got) == 1


# ------------------------------------------------------- dp_release


def test_dp_release_noise_bounded_and_deterministic(spark):
    """Noise is clamped to ±bound, the release floor-clamps at 0, and
    the same input yields the SAME release on every run (the whole
    point of the hash-seeded draw)."""
    from gis_city_county_spark.operators.privacy import dp_release

    df = spark.createDataFrame(
        [(f"g{i % 7}",) for i in range(300)], "seg string"
    )
    out1 = {r["group"]: tuple(r) for r in dp_release(df, "seg", bound=8).collect()}
    out2 = {r["group"]: tuple(r) for r in dp_release(df, "seg", bound=8).collect()}
    assert out1 == out2 and len(out1) == 7
    for _, noisy, exact, eps in out1.values():
        assert abs(noisy - exact) <= 8
        assert noisy >= 0 and eps == 500


def test_dp_release_salt_changes_noise_not_audit(spark):
    """A different salt redraws the noise but never the exact audit —
    the release is keyed, not re-randomized."""
    from gis_city_county_spark.operators.privacy import dp_release

    df = spark.createDataFrame(
        [(f"s{i % 5}",) for i in range(200)], "seg string"
    )
    a = {r["group"]: r for r in dp_release(df, "seg", salt="k1").collect()}
    b = {r["group"]: r for r in dp_release(df, "seg", salt="k2").collect()}
    assert all(
        a[g]["audit_exact"] == b[g]["audit_exact"] for g in a
    )
    assert any(a[g]["noisy_count"] != b[g]["noisy_count"] for g in a)


def test_dp_release_cdf_thresholds_shape():
    """2·bound thresholds, strictly increasing, inside (0, 1)."""
    from gis_city_county_spark.operators.privacy import (
        _dlaplace_cdf_thresholds,
    )

    t = _dlaplace_cdf_thresholds(0.5, 16)
    assert len(t) == 32
    assert all(0.0 < a < 1.0 for a in t)
    assert all(a < b for a, b in zip(t, t[1:]))


def test_dp_release_matches_duckdb_on_customer(spark, sf_dir):
    from gis_city_county_spark.operators.privacy import (
        dp_release,
        dp_release_sql,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = sorted(tuple(r) for r in dp_release(cust, "c_mktsegment").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            dp_release_sql("SELECT * FROM customer", "c_mktsegment")
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------ corr_matrix


def test_corr_matrix_known_correlations(spark):
    """y = 2x ⇒ r = 1; z = −x ⇒ r = −1; a constant column has zero
    variance ⇒ NULL."""
    from gis_city_county_spark.operators.mlprep import corr_matrix

    rows = [(float(i), float(2 * i), float(-i), 5.0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    out = {
        (r["x_name"], r["y_name"]): r
        for r in corr_matrix(
            df,
            {
                "x": F.col("x"),
                "y": F.col("y"),
                "z": F.col("z"),
                "c": F.col("c"),
            },
        ).collect()
    }
    assert len(out) == 6
    assert abs(out[("x", "y")]["pearson_r"] - 1.0) < 1e-12
    assert abs(out[("x", "z")]["pearson_r"] + 1.0) < 1e-12
    assert out[("x", "c")]["pearson_r"] is None
    assert out[("x", "y")]["n"] == 10


def test_corr_matrix_matches_duckdb_on_lineitem(spark, sf_dir):
    from gis_city_county_spark.operators.mlprep import (
        corr_matrix,
        corr_matrix_sql,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = sorted(
        tuple(r)
        for r in corr_matrix(
            li,
            {
                "qty": F.col("l_quantity"),
                "price": F.col("l_extendedprice"),
                "disc": F.col("l_discount"),
                "tax": F.col("l_tax"),
            },
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            corr_matrix_sql(
                "SELECT * FROM lineitem",
                {
                    "qty": "l_quantity",
                    "price": "l_extendedprice",
                    "disc": "l_discount",
                    "tax": "l_tax",
                },
            )
        ).fetchall()
    )
    assert got == want and len(got) == 6


# ------------------------------------------------- loo_target_encode


def test_loo_target_encode_exact_fixture(spark):
    """Category A: targets (1.00, 2.00, 3.00) — each row's LOO mean is
    the mean of the other two, in exact milli-cents; singleton
    category B encodes NULL."""
    from gis_city_county_spark.operators.mlprep import loo_target_encode

    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "A", 2.0), (3, "A", 3.0), (4, "B", 9.0)],
        "id long, cat string, y double",
    )
    out = {r["key"]: r for r in loo_target_encode(df, "id", "cat", "y").collect()}
    # row 1: others are 2.00+3.00 cents=500, /2 ⇒ 250 cents ⇒ 250000 milli
    assert out[1]["loo_milli_cents"] == 250_000
    assert out[2]["loo_milli_cents"] == 200_000
    assert out[3]["loo_milli_cents"] == 150_000
    assert out[4]["loo_milli_cents"] is None and out[4]["n_cat"] == 1


def test_loo_target_encode_matches_duckdb_on_orders(spark, sf_dir):
    from gis_city_county_spark.operators.mlprep import (
        loo_target_encode,
        loo_target_encode_sql,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = sorted(
        tuple(r)
        for r in loo_target_encode(
            o, "o_orderkey", "o_orderpriority", "o_totalprice"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            loo_target_encode_sql(
                "SELECT * FROM orders",
                "o_orderkey", "o_orderpriority", "o_totalprice",
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ----------------------------------------------------- spearman_corr


def test_spearman_known_values(spark):
    """Strictly monotone ⇒ +1; reversed ⇒ −1; a NULL pair is dropped
    (not ranked)."""
    from gis_city_county_spark.operators.mlprep import spearman_corr

    up = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 99.0), (None, 1.0)],
        "x double, y double",
    )
    r = spearman_corr(up, "x", "y").collect()[0]
    assert r["n"] == 4 and abs(r["spearman_r"] - 1.0) < 1e-12
    down = spark.createDataFrame(
        [(1.0, 9.0), (2.0, 7.0), (3.0, 5.0)], "x double, y double"
    )
    r = spearman_corr(down, "x", "y").collect()[0]
    assert abs(r["spearman_r"] + 1.0) < 1e-12


def test_spearman_tie_handling_matches_textbook_formula(spark):
    """Average-rank ties: x=(1,1,2), y=(3,5,4) ⇒ tied x ranks
    (1.5, 1.5, 3) against y ranks (1, 3, 2); the rank deviations
    (−.5, −.5, 1) vs (−1, 1, 0) have zero covariance ⇒ r = 0 exactly
    (scipy.stats.spearmanr agrees).  A wrong tie rule (e.g. min-rank)
    would give a nonzero r here."""
    from gis_city_county_spark.operators.mlprep import spearman_corr

    df = spark.createDataFrame(
        [(1.0, 3.0), (1.0, 5.0), (2.0, 4.0)], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r["spearman_r"] == 0.0


def test_spearman_matches_duckdb_on_lineitem(spark, sf_dir):
    from gis_city_county_spark.operators.mlprep import (
        spearman_corr,
        spearman_corr_sql,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = [tuple(r) for r in spearman_corr(li, "l_quantity", "l_extendedprice").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            spearman_corr_sql(
                "SELECT * FROM lineitem", "l_quantity", "l_extendedprice"
            )
        ).fetchall()
    ]
    assert got == want and len(got) == 1


# ------------------------------------------------- token_burstiness


def test_token_burstiness_poisson_vs_bursty(spark):
    """A token spread one-per-doc has Fano < 1000 (sub-Poisson); a
    token clumped in one doc has Fano > 1000 (bursty)."""
    from gis_city_county_spark.operators.corpus import token_burstiness

    docs = spark.createDataFrame(
        [
            (1, "even bursty bursty bursty bursty"),
            (2, "even filler"),
            (3, "even filler"),
            (4, "even filler"),
        ],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in token_burstiness(docs, "doc_id", "text").collect()}
    # "even": c=(1,1,1,1) ⇒ var 0 ⇒ fano 0
    assert out["even"]["fano_milli"] == 0 and out["even"]["doc_freq"] == 4
    # "bursty": c=(4,0,0,0): N=4, s=4, ss=16 ⇒ (4·16−16)/(4·4) = 3 ⇒ 3000
    assert out["bursty"]["fano_milli"] == 3000 and out["bursty"]["doc_freq"] == 1


def test_token_burstiness_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.corpus import (
        token_burstiness,
        token_burstiness_sql,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r) for r in token_burstiness(d, "doc_id", "text").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            token_burstiness_sql("SELECT * FROM documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want and len(got) == 30


# ----------------------------------------------- seasonal_baseline


def test_seasonal_baseline_zero_fills_empty_hours(spark):
    """Two Mondays: hour 9 has (2, 0) events ⇒ lower-median baseline 0
    for that slot, and the 2-event cell is the top deviation.  The
    absent second-Monday hour-9 cell MUST be zero-filled — without the
    grid the baseline would be 2."""
    from gis_city_county_spark.operators.temporal import seasonal_baseline

    df = spark.createDataFrame(
        [("2024-01-01 09:00:00",), ("2024-01-01 09:30:00",),
         ("2024-01-08 10:00:00",)],
        "ts_s string",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    out = seasonal_baseline(df, "ts", top_k=5).collect()
    top = out[0]
    assert top["hour"] == 9 and top["dow"] == 0
    assert top["n_events"] == 2 and top["baseline"] == 0
    assert top["deviation"] == 2


def test_seasonal_baseline_matches_duckdb_on_events(spark, sf_dir):
    from gis_city_county_spark.operators.temporal import (
        seasonal_baseline,
        seasonal_baseline_sql,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sorted(tuple(r) for r in seasonal_baseline(ev, "ts").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            seasonal_baseline_sql("SELECT * FROM events", "ts")
        ).fetchall()
    )
    assert got == want and len(got) == 20


# -------------------------------------------------- cooccurrence


def test_cooccurrence_pairs_exact_fixture(spark):
    """Items: g1={a,b,c}, g2={a,b}, g3={a} ⇒ (a,b) share 2 groups,
    (a,c) and (b,c) share 1; duplicate memberships count once."""
    from gis_city_county_spark.operators.graph import cooccurrence_pairs

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (1, "c"),
         (2, "a"), (2, "b"), (3, "a")],
        "g long, i string",
    )
    out = {(r["item_a"], r["item_b"]): r["n_shared_groups"]
           for r in cooccurrence_pairs(df, "g", "i").collect()}
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cooccurrence_pairs_matches_duckdb_on_lineitem(spark, sf_dir):
    from gis_city_county_spark.operators.graph import (
        cooccurrence_pairs,
        cooccurrence_pairs_sql,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = sorted(
        tuple(r)
        for r in cooccurrence_pairs(li, "l_partkey", "l_suppkey", 20).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            cooccurrence_pairs_sql(
                "SELECT * FROM lineitem", "l_partkey", "l_suppkey", 20
            )
        ).fetchall()
    )
    assert got == want and len(got) == 20


def test_cooccurrence_cap_bounds_fanout_and_matches_duckdb(spark):
    """The r9-verdict bound: an oversized group (12 items, cap 3)
    must contribute exactly C(3,2)=3 pairs — never C(12,2)=66 — and
    the md5-rank sample must pick the SAME survivors on both engines
    and under repartitioning."""
    from gis_city_county_spark.operators.graph import (
        cooccurrence_pairs,
        cooccurrence_pairs_sql,
    )

    rows = [(1, f"i{k:02d}") for k in range(12)] + [(2, "i00"), (2, "i01")]
    df = spark.createDataFrame(rows, "g long, i string")
    capped = cooccurrence_pairs(df, "g", "i", top_k=100, max_group_size=3)
    got = sorted(tuple(r) for r in capped.collect())
    # group 1 contributes C(3,2)=3 pairs, group 2 C(2,2)=1 — overlaps
    # possible, so bound, not exact count.
    assert len(got) <= 4
    assert all(w <= 2 for _, _, w in got)
    # same sample under a different partitioning
    got_rep = sorted(
        tuple(r)
        for r in cooccurrence_pairs(
            df.repartition(7, "i"), "g", "i", top_k=100, max_group_size=3
        ).collect()
    )
    assert got == got_rep
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g BIGINT, i VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            cooccurrence_pairs_sql(
                "SELECT * FROM t", "g", "i", top_k=100, max_group_size=3
            )
        ).fetchall()
    )
    assert got == want


def test_cooccurrence_cap_is_constant_work_on_power_law_groups(spark):
    """The structural 100 TB claim: a power-law group contributes
    C(cap,2) pairs REGARDLESS of its true size.  A 5000-item group at
    the default cap 64 yields exactly 2016 pairs (each weight 1) —
    uncapped it would be 12,497,500, the quadratic blow-up the r9
    verdict flagged."""
    from gis_city_county_spark.operators.graph import cooccurrence_pairs

    df = spark.range(5000).selectExpr("CAST(1 AS LONG) AS g", "id AS i")
    out = cooccurrence_pairs(df, "g", "i", top_k=1 << 30)
    assert out.count() == 64 * 63 // 2
    assert out.agg(F.max("n_shared_groups")).first()[0] == 1


def test_cooccurrence_truncation_report(spark):
    from gis_city_county_spark.operators.graph import (
        cooccurrence_truncation_report,
    )

    rows = [(1, f"i{k:02d}") for k in range(12)] + [(2, "i00"), (2, "i01")]
    df = spark.createDataFrame(rows, "g long, i string")
    rep = cooccurrence_truncation_report(df, "g", "i", max_group_size=3)
    out = [tuple(r) for r in rep.collect()]
    # only group 1 is oversized: 12 items, 66 true pairs, 3 kept.
    assert out == [(1, 12, 66, 3, 63)]


# -------------------------------------------- multimodal_token_budget


def test_multimodal_token_budget_exact(spark):
    """Text "hello world" = 2 BPE tokens; image 0 is 4×3 at patch=2 ⇒
    2·2 patches + CLS = 5 tokens; budget = 2+5+2 = 9, bucket 0."""
    from gis_city_county_spark.operators.multimodal import (
        multimodal_token_budget,
    )
    from gis_city_county_spark.suite.multimodal_q import _fixture_bmps

    docs = spark.createDataFrame(
        [(0, "hello world"), (9, "a b c, d!")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in multimodal_token_budget(
            docs, _fixture_bmps(spark), "doc_id", "text",
            F.col("doc_id") % 8, "img_id", "payload",
        ).collect()
    }
    assert out[0]["text_tokens"] == 2 and out[0]["image_tokens"] == 5
    assert out[0]["budget_tokens"] == 9 and out[0]["seq_bucket"] == 0
    # doc 9 → image 1 (5×3): ceil(5/2)·ceil(3/2)+1 = 3·2+1 = 7
    # text "a b c, d!" → a, b, c, ",", d, "!" = 6 BPE tokens
    assert out[9]["image_tokens"] == 7 and out[9]["text_tokens"] == 6


# ------------------------------------------------ olap_share_of_parent


def test_share_of_parent_shares_cross_foot(spark, sf_dir):
    """Within every region the nation shares sum to ~1, and the
    region revenues' share_of_total sums to ~1 over all rows."""
    from gis_city_county_spark.suite.tpch_ext import q_share_of_parent

    rows = q_share_of_parent(spark, sf_dir).collect()
    assert len(rows) == 25  # all nations present at every SF
    by_region = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    assert len(by_region) == 5
    for rs in by_region.values():
        assert abs(sum(x["share_of_region"] for x in rs) - 1.0) < 1e-9
    assert abs(sum(x["share_of_total"] for x in rows) - 1.0) < 1e-9


# -------------------------------------------- concentration_profile


def test_concentration_profile_extremes(spark):
    """Perfectly equal activity ⇒ Gini ≈ 0 (exactly (n−1)-free form:
    (2·Σi·c −(n+1)·S)/(n·S) with c constant gives 0); one dominant
    key pushes Gini up and the top band's share toward 1e6."""
    from gis_city_county_spark.operators.profile import concentration_profile

    equal = spark.createDataFrame(
        [(k,) for k in range(10) for _ in range(5)], "u long"
    )
    out = concentration_profile(equal, "u", n_bands=5).collect()
    assert all(r["gini_ppm"] == 0 for r in out)
    assert sum(r["n_keys"] for r in out) == 10
    assert out[-1] if out else True

    skewed = spark.createDataFrame(
        [(0,)] * 96 + [(1,), (2,), (3,), (4,)], "u long"
    )
    rows = {r["band"]: r for r in concentration_profile(skewed, "u", n_bands=5).collect()}
    # key 0 has 96 of 100 events and ranks last (highest count)
    assert rows[4]["share_ppm"] == 960_000
    assert rows[4]["gini_ppm"] > 700_000
    # cumulative share ends at exactly 1e6
    assert max(r["cum_share_ppm"] for r in rows.values()) == 1_000_000


def test_concentration_profile_matches_duckdb_on_events(spark, sf_dir):
    from gis_city_county_spark.operators.profile import (
        concentration_profile,
        concentration_profile_sql,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sorted(tuple(r) for r in concentration_profile(ev, "user_id").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            concentration_profile_sql("SELECT * FROM events", "user_id")
        ).fetchall()
    )
    assert got == want and len(got) == 10


# -------------------------------------------- threshold_yield_curve


def test_threshold_yield_monotone_and_exact(spark):
    """Yield is monotone non-increasing in the threshold, and a pair
    of identical docs (jaccard 1000 permille) survives every cutoff
    while a disjoint doc appears at none."""
    from gis_city_county_spark.operators.dedup import threshold_yield_curve

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different text about spark engines"),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["threshold_permille"], r["n_pairs"], r["n_docs_affected"])
        for r in threshold_yield_curve(docs, "doc_id", "text").collect()
    )
    assert [t for t, _, _ in rows] == [500, 600, 700, 800, 900]
    pair_counts = [p for _, p, _ in rows]
    assert pair_counts == sorted(pair_counts, reverse=True)
    # the identical pair survives the 900 cutoff and touches 2 docs
    assert rows[-1][1] >= 1 and rows[-1][2] >= 2


def test_threshold_yield_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.dedup import (
        threshold_yield_curve,
        threshold_yield_curve_sql,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in threshold_yield_curve(d, "doc_id", "text").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            threshold_yield_curve_sql("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want and len(got) == 5


# ------------------------------------------------------- mmr_rerank


def test_mmr_rerank_diversifies_near_duplicates(spark):
    """Probe [1,0]; candidates: two near-identical highly-relevant
    vectors and one orthogonal-ish one.  Plain top-2 keeps both
    near-dups; MMR's step 2 must skip the duplicate and pick the
    diverse vector."""
    from gis_city_county_spark.operators.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0]),          # probe
        (1, [1.0, 0.0]),          # exactly the probe direction
        (2, [0.99, 0.1]),         # near-duplicate of 1 (sim ≈ 0.995)
        (3, [0.0, 1.0]),          # orthogonal: rel 0, redundancy 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["rank"]: r["id"] for r in
           mmr_rerank(df, "vec_id", "embedding", 0, n_candidates=3,
                      k=2, lambda_milli=300).collect()}
    assert out[1] == 1          # highest relevance first
    # λ=0.3: the near-dup scores 0.3·0.995 − 0.7·0.995 < 0 while the
    # orthogonal vector scores 0 — diversity beats the near-dup.
    assert out[2] == 3


def test_mmr_rerank_lambda_1000_is_plain_topk(spark):
    """lambda=1000 removes the redundancy term: MMR must equal the
    relevance top-k order exactly."""
    from gis_city_county_spark.operators.similarity import (
        cosine_topk,
        mmr_rerank,
    )

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [r["id"] for r in sorted(
        mmr_rerank(df, "vec_id", "embedding", 0, n_candidates=10,
                   k=4, lambda_milli=1000).collect(),
        key=lambda r: r["rank"],
    )]
    probe = df.filter(F.col("vec_id") == 0)
    want = [r["neighbor_id"] for r in sorted(
        cosine_topk(df, probe, "vec_id", "embedding", k=4).collect(),
        key=lambda r: r["rank"],
    )]
    assert got == want


def test_mmr_rerank_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.similarity import (
        mmr_rerank,
        mmr_rerank_sql,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(tuple(r) for r in mmr_rerank(e, "vec_id", "embedding", 0).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            mmr_rerank_sql("embeddings", "vec_id", "embedding", 0)
        ).fetchall()
    )
    assert got == want and len(got) == 5


# ----------------------------------------------- histogram_quantiles


def test_histogram_quantiles_brackets_true_quantile(spark):
    """The reported [bin_lo, bin_hi) interval must contain the exact
    discrete quantile (cents) for every requested permille."""
    import random

    from gis_city_county_spark.operators.sketch import histogram_quantiles

    rnd = random.Random(11)
    vals = [round(rnd.uniform(1, 1000), 2) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = histogram_quantiles(df, "x").collect()
    cents = sorted(int(round(v * 100)) for v in vals)
    n = len(cents)
    for r in out:
        q = r["q_permille"]
        k = -(-q * n // 1000)  # ceil(q·n/1000), 1-based rank
        true_q = cents[k - 1]
        assert r["bin_lo_cents"] <= true_q < r["bin_hi_cents"], (
            q, true_q, r["bin_lo_cents"], r["bin_hi_cents"],
        )
        assert r["n"] == n


def test_histogram_quantiles_constant_column(spark):
    """All-equal values: span collapses, width clamps to 1, every
    quantile brackets the single value."""
    from gis_city_county_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame([(42.5,)] * 100, "x double")
    out = histogram_quantiles(df, "x").collect()
    assert len(out) == 5
    for r in out:
        assert r["bin_lo_cents"] <= 4250 < r["bin_hi_cents"]
        assert r["cum_count"] == 100


def test_histogram_quantiles_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.sketch import (
        histogram_quantiles,
        histogram_quantiles_sql,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = sorted(tuple(r) for r in histogram_quantiles(o, "o_totalprice").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            histogram_quantiles_sql("SELECT * FROM orders", "o_totalprice")
        ).fetchall()
    )
    assert got == want and len(got) == 5


# --------------------------------------------------- minhash_accuracy


def test_minhash_accuracy_identical_docs_zero_error(spark):
    """Two identical docs: exact Jaccard 1000, all signature
    components match ⇒ estimate 1000 ⇒ error 0, bucket 0."""
    from gis_city_county_spark.operators.dedup import minhash_accuracy

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = minhash_accuracy(docs, "doc_id", "text").collect()
    assert len(out) == 1
    r = out[0]
    assert r["err_bucket"] == 0 and r["n_pairs"] == 1
    assert r["min_err_permille"] == 0 and r["max_err_permille"] == 0


def test_minhash_accuracy_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.dedup import (
        minhash_accuracy,
        minhash_accuracy_sql,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in minhash_accuracy(d, "doc_id", "text").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            minhash_accuracy_sql("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------- events_stickiness


def test_stickiness_exact_fixture(spark):
    """Two users on day 1, one of them again on day 2: day-2 DAU is 1,
    trailing-28 MAU is 2 ⇒ stickiness 500000 ppm; day-1 is 2/2 = 1e6.
    Exercises the SHIPPED operator (the suite query delegates to it)."""
    from gis_city_county_spark.operators.temporal import stickiness_report

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"),
         (1, "2024-01-02 09:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {
        str(r["report_day"])[:10]: r
        for r in stickiness_report(ev, "user_id", "ts").collect()
    }
    assert out["2024-01-01"]["stickiness_ppm"] == 1_000_000
    assert out["2024-01-02"]["dau"] == 1 and out["2024-01-02"]["mau28"] == 2
    assert out["2024-01-02"]["stickiness_ppm"] == 500_000


# ------------------------------------------------------ bootstrap_ci


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    """CI lo ≤ point ≤ hi on real-ish data, and two runs are
    identical (hash-seeded replicas)."""
    from gis_city_county_spark.operators.mlprep import bootstrap_ci

    import random

    rnd = random.Random(5)
    df = spark.createDataFrame(
        [(i, round(rnd.uniform(10, 500), 2)) for i in range(2000)],
        "id long, y double",
    )
    r1 = bootstrap_ci(df, "id", "y").collect()[0]
    r2 = bootstrap_ci(df, "id", "y").collect()[0]
    assert r1 == r2
    assert r1["ci_lo_milli_cents"] <= r1["point_mean_milli_cents"]
    assert r1["point_mean_milli_cents"] <= r1["ci_hi_milli_cents"]
    assert r1["n"] == 2000 and r1["n_replicas"] == 32


def test_bootstrap_ci_constant_data_zero_width(spark):
    """All-equal values: every replica mean equals the point mean —
    the CI collapses to a point."""
    from gis_city_county_spark.operators.mlprep import bootstrap_ci

    df = spark.createDataFrame([(i, 7.25) for i in range(300)], "id long, y double")
    r = bootstrap_ci(df, "id", "y").collect()[0]
    assert (r["ci_lo_milli_cents"] == r["ci_hi_milli_cents"]
            == r["point_mean_milli_cents"] == 725_000)


def test_bootstrap_ci_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.mlprep import (
        bootstrap_ci,
        bootstrap_ci_sql,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = [tuple(r) for r in bootstrap_ci(o, "o_orderkey", "o_totalprice").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            bootstrap_ci_sql("SELECT * FROM orders", "o_orderkey", "o_totalprice")
        ).fetchall()
    ]
    assert got == want and len(got) == 1


def test_bootstrap_ci_tiny_input_ranks_against_survivors(spark):
    """On tiny inputs some replicas draw zero total weight and are
    dropped; the upper bound must be the 2nd-LARGEST SURVIVOR (rk =
    cnt−1), not the fixed rank B−1 that may no longer exist (round-9
    ADVICE).  Both engines must agree on the degenerate shape too."""
    from gis_city_county_spark.operators.mlprep import (
        bootstrap_ci,
        bootstrap_ci_sql,
    )

    rows = [(1, 10.0), (2, 20.0)]
    df = spark.createDataFrame(rows, "id long, y double")
    r = bootstrap_ci(df, "id", "y").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    cols = [d[0] for d in con.execute(
        bootstrap_ci_sql("SELECT * FROM t", "id", "y")
    ).description]
    want = dict(zip(cols, con.execute(
        bootstrap_ci_sql("SELECT * FROM t", "id", "y")
    ).fetchall()[0]))
    assert tuple(r) == tuple(want[c] for c in r.asDict())
    # The fixed salt makes the draw deterministic: 29 of 32 replicas
    # survive on this input (3 draw zero total weight), so BOTH
    # bounds must exist — under the old fixed-rank lookup the upper
    # bound (rk=31, absent) came back NULL, and the unguarded
    # division crashed ANSI-mode Spark outright.
    assert r["ci_lo_milli_cents"] is not None
    assert r["ci_hi_milli_cents"] is not None
    assert r["ci_lo_milli_cents"] <= r["ci_hi_milli_cents"]


def test_corr_matrix_rejects_fewer_than_two_metrics(spark):
    """Degenerate input must fail loudly and IDENTICALLY on both
    twins (round-9 ADVICE: the SQL twin used to emit malformed SQL
    while the DataFrame twin returned an empty frame)."""
    import pytest

    from gis_city_county_spark.operators.mlprep import (
        corr_matrix,
        corr_matrix_sql,
    )

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match=">= 2 metrics"):
        corr_matrix(df, {"x": F.col("x")})
    with pytest.raises(ValueError, match=">= 2 metrics"):
        corr_matrix_sql("SELECT 1 AS x", {"x": "x"})


# --------------------------------------------------------- mcnemar


def test_mcnemar_textbook_cells(spark):
    """b=10, c=2 ⇒ statistic = (10−2)²/12 = 64/12 ⇒ 5333 milli (>
    3841: significant); cells cross-foot to n."""
    from gis_city_county_spark.operators.mlprep import mcnemar_test

    rows = (
        [(i, 1, 1, 1) for i in range(20)]         # both right
        + [(100 + i, 0, 0, 1) for i in range(5)]  # both wrong
        + [(200 + i, 1, 0, 1) for i in range(10)] # A only
        + [(300 + i, 0, 1, 1) for i in range(2)]  # B only
    )
    df = spark.createDataFrame(rows, "id long, pa int, pb int, y int")
    r = mcnemar_test(df, "id", "pa", "pb", "y").collect()[0]
    assert r["a_only_right"] == 10 and r["b_only_right"] == 2
    assert r["statistic_milli"] == 5333
    assert (r["both_right"] + r["both_wrong"]
            + r["a_only_right"] + r["b_only_right"]) == r["n_pairs"]


def test_mcnemar_no_discordance_null_statistic(spark):
    from gis_city_county_spark.operators.mlprep import mcnemar_test

    df = spark.createDataFrame(
        [(1, 1, 1, 1), (2, 0, 0, 1)], "id long, pa int, pb int, y int"
    )
    r = mcnemar_test(df, "id", "pa", "pb", "y").collect()[0]
    assert r["statistic_milli"] is None


# ------------------------------------------------------ effect_size


def test_effect_size_known_d(spark):
    """Treatment (2,4) vs control (1,3): means 3.00 vs 2.00, pooled
    s² = 2 ⇒ d = 1/√2 in cents space (scale cancels)."""
    import math

    from gis_city_county_spark.operators.mlprep import effect_size

    df = spark.createDataFrame(
        [("t", 2.0), ("t", 4.0), ("c", 1.0), ("c", 3.0)],
        "g string, y double",
    )
    r = effect_size(df, "g", "t", "y").collect()[0]
    assert r["n_treat"] == 2 and r["n_control"] == 2
    assert abs(r["cohens_d"] - 1 / math.sqrt(2)) < 1e-12


def test_effect_size_degenerate_null(spark):
    """Single-row treatment ⇒ d NULL (variance undefined)."""
    from gis_city_county_spark.operators.mlprep import effect_size

    df = spark.createDataFrame(
        [("t", 5.0), ("c", 1.0), ("c", 2.0)], "g string, y double"
    )
    r = effect_size(df, "g", "t", "y").collect()[0]
    assert r["cohens_d"] is None


def test_mcnemar_and_effect_size_match_duckdb(spark, sf_dir):
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.mlprep import (
        effect_size,
        effect_size_sql,
        mcnemar_test,
        mcnemar_test_sql,
    )

    con = duckdb.connect()
    for t in ["events", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        (F.col("value") >= 50).cast("int").alias("pa"),
        (F.col("value") >= 60).cast("int").alias("pb"),
        (F.col("user_id") % 2).cast("int").alias("y"),
    )
    got = [tuple(r) for r in mcnemar_test(ev, "event_id", "pa", "pb", "y").collect()]
    src = (
        "SELECT event_id, CAST(value >= 50 AS INTEGER) AS pa,"
        " CAST(value >= 60 AS INTEGER) AS pb,"
        " CAST(user_id % 2 AS INTEGER) AS y FROM events"
    )
    want = [tuple(r) for r in con.execute(
        mcnemar_test_sql(src, "event_id", "pa", "pb", "y")).fetchall()]
    assert got == want
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got2 = [tuple(r) for r in effect_size(
        o, "o_orderpriority", "1-URGENT", "o_totalprice").collect()]
    want2 = [tuple(r) for r in con.execute(effect_size_sql(
        "SELECT * FROM orders", "o_orderpriority", "'1-URGENT'",
        "o_totalprice")).fetchall()]
    assert got2 == want2


# -------------------------------------------------------- ego_sample


def test_ego_sample_fanout_caps_and_determinism(spark):
    """Per seed ≤ k hop-1 rows; per (seed, parent) ≤ k hop-2 rows; the
    seed never appears in its own 2-hop frontier; two runs identical."""
    from gis_city_county_spark.operators.graph import ego_sample

    # star + chain graph: node 0 connects to 1..30 (high degree), node
    # 1 connects to 40..80 — undirected edge list
    edges = []
    for i in range(1, 31):
        edges += [(0, i), (i, 0)]
    for i in range(40, 81):
        edges += [(1, i), (i, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out1 = ego_sample(df, seed_fraction=1.0, k=5).collect()
    out2 = ego_sample(df, seed_fraction=1.0, k=5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    from collections import Counter

    h1 = Counter((r["seed"],) for r in out1 if r["hop"] == 1)
    assert max(h1.values()) <= 5
    h2 = Counter((r["seed"], r["parent"]) for r in out1 if r["hop"] == 2)
    assert max(h2.values()) <= 5
    assert all(r["node"] != r["seed"] for r in out1 if r["hop"] == 2)


def test_ego_sample_matches_duckdb_on_trade_graph(spark, sf_dir):
    from gis_city_county_spark.operators.graph import ego_sample, ego_sample_sql
    from gis_city_county_spark.suite.graph_q import _EGO_EDGES_SQL, _trade_edges

    got = sorted(
        tuple(r) for r in ego_sample(_trade_edges(spark, sf_dir)).collect()
    )
    con = duckdb.connect()
    for t in ["lineitem", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = sorted(
        tuple(r) for r in con.execute(ego_sample_sql(_EGO_EDGES_SQL)).fetchall()
    )
    assert got == want and len(got) > 0


# ----------------------------------------------------- pseudonymize


def test_pseudonymize_deterministic_and_collision_audit(spark):
    """Same salt ⇒ same tokens across runs; full-width tokens have
    n_ids == 1 everywhere at this scale; 1-hex tokens MUST collide
    (16 buckets, 100 ids) and the audit reports it."""
    from gis_city_county_spark.operators.privacy import pseudonymize

    df = spark.createDataFrame([(i,) for i in range(100)], "uid long")
    a = sorted(tuple(r) for r in pseudonymize(df, "uid").collect())
    b = sorted(tuple(r) for r in pseudonymize(df, "uid").collect())
    assert a == b and len(a) == 100
    assert all(n_ids == 1 for _, n_ids, _ in a)
    short = pseudonymize(df, "uid", token_hex_chars=1).collect()
    assert len(short) <= 16
    assert any(r["n_ids"] > 1 for r in short)
    assert sum(r["n_rows"] for r in short) == 100


def test_pseudonymize_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.privacy import (
        pseudonymize,
        pseudonymize_sql,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = sorted(tuple(r) for r in pseudonymize(ev, "user_id").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            pseudonymize_sql("SELECT * FROM events", "user_id")
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------- best_window


def test_best_window_picks_densest_cluster(spark):
    """Hits at positions 0 and then a 3-hit cluster at 20..22 with
    w=5: the best window starts at 20 with 3 hits (4 total)."""
    from gis_city_county_spark.operators.search import best_window

    text = (
        "data " + "x " * 19 + "data model data " + "y " * 10
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = best_window(df, "doc_id", "text", ["data", "model"],
                    window_tokens=5).collect()[0]
    assert r["best_start"] == 20 and r["window_hits"] == 3
    assert r["total_hits"] == 4


def test_best_window_no_hit_docs_absent(spark):
    from gis_city_county_spark.operators.search import best_window

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "data here")],
        "doc_id long, text string",
    )
    out = best_window(df, "doc_id", "text", ["data"]).collect()
    assert [r["id"] for r in out] == [2]


def test_best_window_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.search import (
        best_window,
        best_window_sql,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in best_window(d, "doc_id", "text", ["data", "model"]).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            best_window_sql(
                "SELECT * FROM documents", "doc_id", "text",
                ["data", "model"],
            )
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------ hilbert key


def test_hilbert_key_matches_textbook_and_is_adjacent(spark):
    """Every cell of the 16×16 grid matches the textbook xy2d walk,
    and consecutive keys are 4-neighbors (the locality property that
    IS the point of Hilbert over Z-order)."""
    from gis_city_county_spark.sources.layout import with_hilbert_key

    def xy2d(order, x, y):
        d, s = 0, order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in with_hilbert_key(df, F.col("x"), F.col("y"), bits=4).collect()
    }
    assert all(got[(x, y)] == xy2d(16, x, y) for x, y in rows)
    inv = {v: k for k, v in got.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(255)
    )


def test_hilbert_hist_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.suite.layout_q import (
        _hilbert_oracle,
        q_hilbert_hist,
    )

    got = sorted(tuple(r) for r in q_hilbert_hist(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_hilbert_oracle()).fetchall())
    assert got == want and len(got) > 0


# ------------------------------------------- events_conversion_latency


def test_conversion_latency_exact_fixture(spark):
    """User 1 signs up at 10:00, purchases at 10:10 (600 s); a
    purchase BEFORE the signup never counts; a user without purchase
    is absent.  Exercises the SHIPPED operator."""
    from gis_city_county_spark.operators.profile import group_quantiles
    from gis_city_county_spark.operators.temporal import conversion_latency

    ev = spark.createDataFrame(
        [
            (1, "signup", "2024-01-01 10:00:00"),
            (1, "purchase", "2024-01-01 10:10:00"),
            (2, "purchase", "2024-01-01 09:00:00"),  # pre-signup
            (2, "signup", "2024-01-01 09:30:00"),
            (3, "signup", "2024-01-01 08:00:00"),    # never converts
        ],
        "user_id long, event_type string, ts_s string",
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    lat = conversion_latency(
        ev, "user_id", "ts", "event_type", "signup", "purchase"
    )
    rows = lat.collect()
    assert len(rows) == 1 and rows[0]["latency_sec"] == 600
    q = group_quantiles(lat, "cohort_month", "latency_sec").collect()[0]
    assert q["n"] == 1 and q["p50"] == 600.0


# -------------------------------------------------------- feed_audit


def test_feed_audit_classifies_all_violation_kinds(spark):
    """Orphaned update (key 99 not in base), orphaned delete, a
    conflicting re-insert of key 1, plus clean rows of each kind."""
    from gis_city_county_spark.operators.cdc import feed_audit

    base = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    changes = spark.createDataFrame(
        [
            (1, "U"), (99, "U"),   # clean update, orphaned update
            (2, "D"), (98, "D"),   # clean delete, orphaned delete
            (50, "I"), (1, "I"),   # clean insert, conflicting insert
        ],
        "k long, op string",
    )
    out = {r["op"]: r for r in feed_audit(base, changes, ["k"]).collect()}
    assert out["U"]["n_changes"] == 2 and out["U"]["n_violations"] == 1
    assert out["D"]["n_changes"] == 2 and out["D"]["n_violations"] == 1
    assert out["I"]["n_changes"] == 2 and out["I"]["n_violations"] == 1


def test_feed_audit_matches_duckdb(spark, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    got = sorted(tuple(r) for r in q["cdc_feed_audit"](spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(o["cdc_feed_audit"]).fetchall())
    assert got == want and len(got) == 3


# ------------------------------------------------------ strip_markup


def test_strip_markup_counts_and_cleans(spark):
    from gis_city_county_spark.operators.textstats import strip_markup

    df = spark.createDataFrame(
        [(1, "<p>Hello &amp; welcome</p>  to <b>Spark</b>!"),
         (2, "plain text")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in strip_markup(df, "doc_id", "text").collect()}
    assert out[1]["clean_text"] == "Hello welcome to Spark !"
    assert out[1]["n_tags"] == 4 and out[1]["n_entities"] == 1
    assert out[2]["clean_text"] == "plain text"
    assert out[2]["n_tags"] == 0 and out[2]["n_chars_before"] == 10


def test_strip_markup_vertical_tab_parity(spark):
    """Java ``\\s`` includes \\x0B, RE2's does not — the explicit
    whitespace class (round-9 ADVICE) must make a \\x0B document
    clean identically on both engines."""
    from gis_city_county_spark.operators.textstats import (
        strip_markup,
        strip_markup_sql,
    )

    rows = [(1, "a\x0b\x0bb <i>c</i>\td"), (2, " x\x0b ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in strip_markup(df, "doc_id", "text").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(
            strip_markup_sql("SELECT * FROM t", "doc_id", "text")
        ).fetchall()
    )
    assert got == want
    by_id = {t[0]: t[1] for t in got}
    assert by_id[1] == "a b c d"


def test_strip_markup_matches_duckdb_on_documents(spark, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    got = sorted(tuple(r) for r in q["text_strip_markup"](spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(o["text_strip_markup"]).fetchall())
    assert got == want and len(got) > 0


# ------------------------------------------------ split_balance_audit


def test_split_balance_cross_foots(spark):
    """Cells cross-foot to the corpus; every (split,label) present;
    an intentionally label-correlated key shows a big |delta|."""
    from gis_city_county_spark.operators.corpus import split_balance_audit

    # neutral: label independent of key hash
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)],
        "k long, lab string",
    )
    rows = split_balance_audit(df, "k", "lab").collect()
    assert sum(r["n"] for r in rows) == 1000
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}
    for r in rows:
        assert abs(r["delta_ppm"]) < 200_000  # roughly balanced


def test_split_balance_matches_duckdb(spark, sf_dir):
    from gis_city_county_spark.operators.corpus import (
        split_balance_audit,
        split_balance_audit_sql,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in split_balance_audit(d, "doc_id", "lang").collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            split_balance_audit_sql("SELECT * FROM documents", "doc_id", "lang")
        ).fetchall()
    )
    assert got == want and len(got) > 0
