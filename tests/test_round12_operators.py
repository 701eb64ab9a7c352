"""Round-12 operator tests.

New operators this round: Mann-Whitney U + Cliff's delta (the
unpaired rank test), quadratic-weighted kappa (scan-side moment
factorization), Pettitt rank changepoint and the Wald-Wolfowitz runs
test over the zero-filled day grid, total-variation source novelty,
and the encoding-damage census.  Each test pins a hand-checkable
fixture AND DuckDB parity (the driver's exact comparison, in
miniature).
"""

from __future__ import annotations

import datetime

import duckdb
from pyspark.sql import functions as F  # noqa: F401  (spec-style imports)


# ------------------------------------------------- Mann-Whitney U


def _duck(sql, create, rows):
    con = duckdb.connect()
    con.execute(create)
    ph = ", ".join("?" for _ in rows[0])
    table = create.split()[2]
    con.executemany(f"INSERT INTO {table} VALUES ({ph})", rows)
    return con.execute(sql)


def test_mann_whitney_exact_and_parity(spark):
    """Ties get milli midranks; U_a from the brute-force pair count
    (x beats y = 1, tie = 1/2); crossfoot U_a + U_b = n_a·n_b."""
    from gis_city_county_spark.operators.mlprep import (
        mann_whitney_u,
        mann_whitney_u_sql,
    )

    rows = [(0, 1), (0, 2), (0, 2), (0, 5), (1, 2), (1, 3), (1, 7), (1, 7)]
    df = spark.createDataFrame(rows, "side int, v bigint")
    got = mann_whitney_u(df, "side", "v").collect()[0].asDict()

    a = [v for s, v in rows if s == 0]
    b = [v for s, v in rows if s == 1]
    ua = sum(
        1000 if x > y else 500 if x == y else 0 for x in a for y in b
    )
    assert got["u_a_milli"] == ua
    assert got["u_a_milli"] + got["u_b_milli"] == 1000 * len(a) * len(b)
    # delta = 2U/(n_a n_b) − 1 = 2·3/16 − 1 = −0.625
    assert got["cliffs_delta_ppm"] == -625000

    res = _duck(
        mann_whitney_u_sql("SELECT * FROM t", "side", "v"),
        "CREATE TABLE t (side INTEGER, v BIGINT)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want


def test_mann_whitney_empty_side_null_delta(spark):
    from gis_city_county_spark.operators.mlprep import mann_whitney_u

    df = spark.createDataFrame([(0, 3), (0, 5)], "side int, v bigint")
    row = mann_whitney_u(df, "side", "v").collect()[0]
    assert row["n_b"] == 0 and row["cliffs_delta_ppm"] is None


# --------------------------------------------- weighted kappa


def test_weighted_kappa_exact_and_parity(spark):
    """Quadratic-weighted kappa equals the contingency-table formula
    (computed by hand here via the marginal products) and matches
    DuckDB bit-for-bit; constant labelings yield NULL."""
    import collections

    from gis_city_county_spark.operators.mlprep import (
        weighted_kappa,
        weighted_kappa_sql,
    )

    rows = [(1, 1), (2, 2), (3, 3), (4, 4), (2, 2), (1, 2)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = weighted_kappa(df, "a", "b").collect()[0].asDict()

    n = len(rows)
    o = sum((a - b) ** 2 for a, b in rows)
    ra = collections.Counter(a for a, _ in rows)
    cb = collections.Counter(b for _, b in rows)
    e_num = sum(
        ra[i] * cb[j] * (i - j) ** 2 for i in ra for j in cb
    )
    assert got["o_num"] == n * o
    assert got["e_num"] == e_num
    kappa = 1 - (n * o) / e_num
    assert got["kappa_w_milli"] == int(kappa * 1000)  # 0.918...

    res = _duck(
        weighted_kappa_sql("SELECT * FROM t", "a", "b"),
        "CREATE TABLE t (a INTEGER, b INTEGER)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want

    const = spark.createDataFrame([(2, 2), (2, 2)], "a int, b int")
    assert weighted_kappa(const, "a", "b").collect()[0][
        "kappa_w_milli"
    ] is None


def test_weighted_kappa_negative_for_reversed(spark):
    """Systematically reversed graders score below zero — the sign
    split keeps Spark div and DuckDB // in agreement on negatives."""
    from gis_city_county_spark.operators.mlprep import (
        weighted_kappa,
        weighted_kappa_sql,
    )

    rows = [(i, 5 - i) for i in range(6)] * 3
    df = spark.createDataFrame(rows, "a int, b int")
    got = weighted_kappa(df, "a", "b").collect()[0].asDict()
    assert got["kappa_w_milli"] < 0
    res = _duck(
        weighted_kappa_sql("SELECT * FROM t", "a", "b"),
        "CREATE TABLE t (a INTEGER, b INTEGER)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want


# ------------------------------------------ Pettitt changepoint


def _event_rows(daily_counts, start=datetime.datetime(2024, 1, 1, 10)):
    rows, eid = [], 0
    for i, v in enumerate(daily_counts):
        for k in range(v):
            rows.append(
                (eid, start + datetime.timedelta(days=i, minutes=k))
            )
            eid += 1
    return rows


def test_pettitt_matches_bruteforce_and_duckdb(spark):
    """U_t from the cells recurrence equals the literal double sum
    Σ_{i≤t}Σ_{j>t} sign(x_i − x_j); exactly one changepoint flag at
    the max-|U| day (t < D); bit parity with DuckDB."""
    from gis_city_county_spark.operators.temporal import (
        pettitt_changepoint,
        pettitt_changepoint_sql,
    )

    vals = [2, 3, 2, 0, 3, 2, 9, 8, 10, 9, 0, 9]
    rows = _event_rows(vals)
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = [tuple(r) for r in pettitt_changepoint(df, "ts").collect()]

    res = _duck(
        pettitt_changepoint_sql("SELECT * FROM t", "ts"),
        "CREATE TABLE t (id BIGINT, ts TIMESTAMP)",
        rows,
    )
    assert got == [tuple(r) for r in res.fetchall()]

    def sgn(x):
        return (x > 0) - (x < 0)

    d = len(vals)
    u = [
        sum(
            sgn(vals[i] - vals[j])
            for i in range(t + 1)
            for j in range(t + 1, d)
        )
        for t in range(d)
    ]
    assert [r[2] for r in got] == u
    flags = [r for r in got if r[3]]
    assert len(flags) == 1
    assert abs(flags[0][2]) == max(abs(x) for x in u[:-1])
    # the level shift after day 6 is found at day 6
    assert flags[0][0] == datetime.datetime(2024, 1, 6)


def test_pettitt_constant_series_no_signal(spark):
    from gis_city_county_spark.operators.temporal import (
        pettitt_changepoint,
    )

    rows = _event_rows([4, 4, 4, 4])
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = pettitt_changepoint(df, "ts").collect()
    assert all(r["u_stat"] == 0 for r in out)
    assert sum(r["is_changepoint"] for r in out) == 1  # earliest-day tie


# ------------------------------------------------- runs test


def test_runs_test_hand_count_and_parity(spark):
    """Lower median 3 over the 12-day fixture; equal-to-median days
    drop; the - - - - + + + + - + sequence has 4 runs; z matches the
    closed form on both engines bit-for-bit."""
    from gis_city_county_spark.operators.temporal import (
        runs_test,
        runs_test_sql,
    )

    vals = [2, 3, 2, 0, 3, 2, 9, 8, 10, 9, 0, 9]
    rows = _event_rows(vals)
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = runs_test(df, "ts").collect()[0].asDict()
    assert got["median_n"] == 3
    assert got["n_above"] == 5 and got["n_below"] == 5
    assert got["n_runs"] == 4
    a, b, r = 5, 5, 4
    z_num = (r - 1) * (a + b) - 2 * a * b
    assert got["z_num"] == z_num
    import math

    z = z_num * math.sqrt(
        (a + b - 1) / (2 * a * b * (2 * a * b - a - b))
    )
    assert got["z_score"] == z

    res = _duck(
        runs_test_sql("SELECT * FROM t", "ts"),
        "CREATE TABLE t (id BIGINT, ts TIMESTAMP)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want


def test_runs_test_one_sided_null_z(spark):
    """All days above/below never happens vs the median by
    construction, but a two-day series degenerates (variance factor
    0) — z must be NULL, not a crash."""
    from gis_city_county_spark.operators.temporal import runs_test

    rows = _event_rows([1, 5])
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    row = runs_test(df, "ts").collect()[0]
    assert row["z_score"] is None


# ------------------------------------------------ TV distance


def test_tv_distance_exact_fractions_and_parity(spark):
    """tv_ppm equals the floor of the exact fractions::Fraction TV
    against the rest-of-corpus distribution — including the
    never-seen-token closed form — and matches DuckDB."""
    import collections
    from fractions import Fraction

    from gis_city_county_spark.operators.corpus import (
        tv_distance,
        tv_distance_sql,
    )

    rows = [
        (1, "web", "the cat sat on the mat"),
        (2, "web", "the dog sat"),
        (3, "code", "def foo bar baz qux"),
        (4, "code", "def bar"),
        (5, "wiki", "the history of the cat"),
    ]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    got = [tuple(r) for r in tv_distance(df, "src", "text").collect()]

    res = _duck(
        tv_distance_sql("t", "src", "text"),
        "CREATE TABLE t (id BIGINT, src VARCHAR, text VARCHAR)",
        rows,
    )
    assert got == [tuple(r) for r in res.fetchall()]

    toks = collections.defaultdict(list)
    for _, s, t in rows:
        toks[s] += t.lower().split()
    allt = [w for v in toks.values() for w in v]
    for g, n_tok, vocab, ppm in got:
        pg = collections.Counter(toks[g])
        rest = collections.Counter(allt) - pg
        ng, nr = sum(pg.values()), sum(rest.values())
        tv = (
            sum(
                abs(
                    Fraction(pg.get(t, 0), ng)
                    - Fraction(rest.get(t, 0), nr)
                )
                for t in set(allt)
            )
            / 2
        )
        assert ppm == int(tv * 1_000_000)
    # fully disjoint vocabulary ('code') saturates at exactly 1.0
    assert dict((g, p) for g, _, _, p in got)["code"] == 1_000_000


def test_tv_distance_single_group_null(spark):
    from gis_city_county_spark.operators.corpus import tv_distance

    df = spark.createDataFrame(
        [(1, "only", "a b c")], "id long, src string, text string"
    )
    assert tv_distance(df, "src", "text").collect()[0]["tv_ppm"] is None


# ------------------------------------------- encoding anomaly


def test_encoding_anomaly_flags_and_parity(spark):
    """Mojibake digraphs, U+FFFD and C0 controls each counted once
    per kind; NULL text counts toward n_docs but sets no flags; bit
    parity with DuckDB (literal substrings — no regex dialect)."""
    from gis_city_county_spark.operators.textstats import (
        encoding_anomaly,
        encoding_anomaly_sql,
    )

    rows = [
        (1, "en", "clean text"),
        (2, "en", "mojibake Ã© here and â€™ there"),
        (3, "en", "bad � char \x01\x02 ctrl"),
        (4, "fr", None),
        (5, "fr", "propre"),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    got = [tuple(r) for r in encoding_anomaly(df, "lang", "text").collect()]
    res = _duck(
        encoding_anomaly_sql("t", "lang", "text"),
        "CREATE TABLE t (id BIGINT, lang VARCHAR, text VARCHAR)",
        rows,
    )
    assert got == [tuple(r) for r in res.fetchall()]
    en = dict(
        zip(
            ["lang", "n_docs", "repl", "moji", "ctrl", "rppm", "mppm"],
            got[0],
        )
    )
    assert en["n_docs"] == 3
    assert en["repl"] == 1 and en["moji"] == 1 and en["ctrl"] == 2
    assert en["rppm"] == 333333
    fr = got[1]
    assert fr[1] == 2 and fr[2] == 0 and fr[4] == 0


# --------------------------------------------- difference-in-differences


def test_did_exact_and_parity(spark):
    """Four-cell fixture with hand-computed means: DID =
    (45 − 10) − (30 − 15) = 20.0; bit-equal with DuckDB."""
    from gis_city_county_spark.operators.mlprep import (
        did_estimate,
        did_estimate_sql,
    )

    rows = [
        (0, 0, 10), (0, 0, 20),          # control pre, mean 15
        (0, 1, 30),                      # control post, mean 30
        (1, 0, 5), (1, 0, 15),           # treated pre, mean 10
        (1, 1, 40), (1, 1, 50),          # treated post, mean 45
    ]
    df = spark.createDataFrame(rows, "arm int, period int, v bigint")
    got = did_estimate(df, "arm", "period", "v").collect()[0].asDict()
    assert got["did_estimate"] == 20.0
    assert got["n_t_post"] == 2 and got["sum_c_pre"] == 30

    res = _duck(
        did_estimate_sql("SELECT * FROM t", "arm", "period", "v"),
        "CREATE TABLE t (arm INTEGER, period INTEGER, v BIGINT)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want


def test_did_empty_cell_null(spark):
    """Any empty cell (here treated-post) makes the estimate NULL
    instead of a divide-by-zero abort."""
    from gis_city_county_spark.operators.mlprep import did_estimate

    rows = [(0, 0, 10), (0, 1, 20), (1, 0, 5)]
    df = spark.createDataFrame(rows, "arm int, period int, v bigint")
    row = did_estimate(df, "arm", "period", "v").collect()[0]
    assert row["n_t_post"] == 0 and row["did_estimate"] is None


# --------------------------------------------- Benjamini-Hochberg FDR


def test_bh_fdr_step_up_past_failing_rank(spark):
    """The defining BH subtlety: rank 1 FAILS the line (20000·3 >
    50000·1) but rank 3 passes, so k* = 3 and ALL THREE are rejected
    — rejection is by k*, not per-row line membership."""
    from gis_city_county_spark.operators.mlprep import bh_fdr, bh_fdr_sql

    rows = [("a", 20000), ("b", 30000), ("c", 45000)]
    df = spark.createDataFrame(rows, "tid string, p bigint")
    got = [tuple(r) for r in bh_fdr(df, "tid", "p").collect()]
    assert got == [
        ("a", 20000, 1, False, True),
        ("b", 30000, 2, True, True),
        ("c", 45000, 3, True, True),
    ]
    res = _duck(
        bh_fdr_sql("SELECT * FROM t", "tid", "p"),
        "CREATE TABLE t (tid VARCHAR, p BIGINT)",
        rows,
    )
    assert got == [tuple(r) for r in res.fetchall()]


def test_bh_fdr_ties_and_none_rejected(spark):
    """Tied p-values rank by the test-id tiebreak (strict total
    order, both engines); when nothing passes the line k* = 0 and
    nothing is rejected."""
    from gis_city_county_spark.operators.mlprep import bh_fdr, bh_fdr_sql

    rows = [("y", 400000), ("x", 400000), ("z", 900000)]
    df = spark.createDataFrame(rows, "tid string, p bigint")
    got = [tuple(r) for r in bh_fdr(df, "tid", "p").collect()]
    assert [g[0] for g in got] == ["x", "y", "z"]
    assert all(not g[3] and not g[4] for g in got)
    res = _duck(
        bh_fdr_sql("SELECT * FROM t", "tid", "p"),
        "CREATE TABLE t (tid VARCHAR, p BIGINT)",
        rows,
    )
    assert got == [tuple(r) for r in res.fetchall()]


# --------------------------------------------- Mantel-Haenszel OR


def test_mantel_haenszel_exact_and_parity(spark):
    """One stratum reduces to the plain odds ratio ((6·6)/(2·2) = 9);
    a second, effect-reversed stratum pulls the pooled OR back to 1;
    milli terms are per-stratum floor divisions, bit-equal DuckDB."""
    from gis_city_county_spark.operators.mlprep import (
        mantel_haenszel_or,
        mantel_haenszel_or_sql,
    )

    one = (
        [("s1", 1, 1)] * 6 + [("s1", 1, 0)] * 2
        + [("s1", 0, 1)] * 2 + [("s1", 0, 0)] * 6
    )
    df = spark.createDataFrame(one, "s string, t int, o int")
    got = mantel_haenszel_or(df, "s", "t", "o").collect()[0].asDict()
    # floor(6*6*1000/16) = 2250, floor(2*2*1000/16) = 250
    assert got["num_milli"] == 2250 and got["den_milli"] == 250
    assert got["or_mh"] == 9.0

    two = one + (
        [("s2", 1, 1)] * 2 + [("s2", 1, 0)] * 6
        + [("s2", 0, 1)] * 6 + [("s2", 0, 0)] * 2
    )
    df2 = spark.createDataFrame(two, "s string, t int, o int")
    got2 = mantel_haenszel_or(df2, "s", "t", "o").collect()[0].asDict()
    assert got2["n_strata"] == 2 and got2["n_rows"] == 32
    assert got2["num_milli"] == got2["den_milli"] == 2500
    assert got2["or_mh"] == 1.0

    res = _duck(
        mantel_haenszel_or_sql("SELECT * FROM t", "s", "t", "o"),
        "CREATE TABLE t (s VARCHAR, t INTEGER, o INTEGER)",
        two,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got2 == want


def test_mantel_haenszel_zero_denominator_null(spark):
    """No treated failures and no control successes anywhere →
    denominator 0 → NULL, not a divide-by-zero."""
    from gis_city_county_spark.operators.mlprep import mantel_haenszel_or

    rows = [("s", 1, 1), ("s", 1, 1), ("s", 0, 0)]
    df = spark.createDataFrame(rows, "s string, t int, o int")
    row = mantel_haenszel_or(df, "s", "t", "o").collect()[0]
    assert row["den_milli"] == 0 and row["or_mh"] is None


# --------------------------------------------- CUPED lift


def test_cuped_exact_and_parity(spark):
    """y = 10x exactly, so θ = 10 and the adjusted lift is 0 (the
    raw 20-unit gap is pure covariate imbalance); DuckDB bit-equal."""
    from gis_city_county_spark.operators.mlprep import (
        cuped_lift,
        cuped_lift_sql,
    )

    rows = [(0, 10, 1), (0, 20, 2), (1, 30, 3), (1, 40, 4)]
    df = spark.createDataFrame(rows, "arm int, y bigint, x bigint")
    got = cuped_lift(df, "arm", "y", "x").collect()[0].asDict()
    assert got["theta"] == 10.0
    assert got["raw_lift"] == 20.0
    assert got["cuped_lift"] == 0.0

    res = _duck(
        cuped_lift_sql("SELECT * FROM t", "arm", "y", "x"),
        "CREATE TABLE t (arm INTEGER, y BIGINT, x BIGINT)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want


def test_cuped_constant_covariate_degrades_to_raw(spark):
    """var(X) = 0 → θ = 0 and the CUPED lift equals the raw lift;
    an empty arm NULLs both lifts."""
    from gis_city_county_spark.operators.mlprep import cuped_lift

    rows = [(0, 10, 7), (0, 20, 7), (1, 40, 7)]
    df = spark.createDataFrame(rows, "arm int, y bigint, x bigint")
    got = cuped_lift(df, "arm", "y", "x").collect()[0]
    assert got["theta"] == 0.0
    assert got["cuped_lift"] == got["raw_lift"] == 25.0

    solo = spark.createDataFrame([(0, 10, 7)], "arm int, y bigint, x bigint")
    row = cuped_lift(solo, "arm", "y", "x").collect()[0]
    assert row["raw_lift"] is None and row["cuped_lift"] is None


# --------------------------------------------- ICC / design effect


def test_icc_perfect_and_zero_clustering(spark):
    """Two clusters [1,1] and [3,3]: all variance between → ICC = 1,
    deff = 1 + (2−1)·1 = 2.  Identical clusters [1,3],[1,3]: ICC
    hits the ANOVA lower bound −1/(n₀−1) = −1, deff = 0.  Both
    bit-equal with DuckDB."""
    from gis_city_county_spark.operators.mlprep import (
        icc_design_effect,
        icc_design_effect_sql,
    )

    rows = [("c1", 1), ("c1", 1), ("c2", 3), ("c2", 3)]
    df = spark.createDataFrame(rows, "g string, y bigint")
    got = icc_design_effect(df, "g", "y").collect()[0].asDict()
    assert got["n_clusters"] == 2 and got["n_rows"] == 4
    # milli means 1000/3000, b̄=2000: SSB = 2·10⁶+2·10⁶; SST = 4·10⁶
    assert int(got["ssb_microsq"]) == 4_000_000
    assert int(got["ssw_microsq"]) == 0
    assert got["icc"] == 1.0 and got["deff"] == 2.0

    res = _duck(
        icc_design_effect_sql("SELECT * FROM t", "g", "y"),
        "CREATE TABLE t (g VARCHAR, y BIGINT)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want

    anti = [("c1", 1), ("c1", 3), ("c2", 1), ("c2", 3)]
    df2 = spark.createDataFrame(anti, "g string, y bigint")
    got2 = icc_design_effect(df2, "g", "y").collect()[0].asDict()
    assert int(got2["ssb_microsq"]) == 0
    assert got2["icc"] == -1.0 and got2["deff"] == 0.0
    res2 = _duck(
        icc_design_effect_sql("SELECT * FROM t", "g", "y"),
        "CREATE TABLE t (g VARCHAR, y BIGINT)",
        anti,
    )
    want2 = dict(zip([d[0] for d in res2.description], res2.fetchall()[0]))
    assert got2 == want2


def test_icc_degenerate_nulls(spark):
    """Constant data (zero total variance) and a single cluster both
    yield NULL ICC/deff instead of 0/0."""
    from gis_city_county_spark.operators.mlprep import icc_design_effect

    const = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5)], "g string, y bigint"
    )
    row = icc_design_effect(const, "g", "y").collect()[0]
    assert row["icc"] is None and row["deff"] is None

    solo = spark.createDataFrame([("a", 1), ("a", 9)], "g string, y bigint")
    row2 = icc_design_effect(solo, "g", "y").collect()[0]
    assert row2["n_clusters"] == 1
    assert row2["icc"] is None and row2["deff"] is None


# --------------------------------------------- conformal coverage


def test_conformal_exact_and_parity(spark):
    """Hand-checkable split: 9 calibration scores 10..90, α = 10% →
    k = ⌈10·0.9⌉ = 9 → q̂ = 90; test scores [5, 50, 91] → covered 2,
    coverage 666666 ppm.  Bit-equal with DuckDB."""
    from gis_city_county_spark.operators.mlprep import (
        conformal_coverage,
        conformal_coverage_sql,
    )

    rows = [(0, 10 * i, i) for i in range(1, 10)] + [
        (1, 5, 100), (1, 50, 101), (1, 91, 102),
    ]
    df = spark.createDataFrame(rows, "split int, score bigint, rid bigint")
    got = conformal_coverage(df, "split", "score", "rid").collect()[0].asDict()
    assert got["n_calib"] == 9 and got["k_rank"] == 9
    assert got["qhat"] == 90
    assert got["n_covered"] == 2 and got["coverage_ppm"] == 666666

    res = _duck(
        conformal_coverage_sql("SELECT * FROM t", "split", "score", "rid"),
        "CREATE TABLE t (split INTEGER, score BIGINT, rid BIGINT)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want


def test_conformal_small_calibration_covers_everything(spark):
    """k = ⌈(n_c+1)(1−α)⌉ > n_c (calibration too small for α) → q̂
    NULL and the prediction set is everything: coverage 10⁶ ppm."""
    from gis_city_county_spark.operators.mlprep import (
        conformal_coverage,
        conformal_coverage_sql,
    )

    rows = [(0, 10, 1), (0, 20, 2), (1, 999, 3), (1, 5, 4)]
    df = spark.createDataFrame(rows, "split int, score bigint, rid bigint")
    got = conformal_coverage(
        df, "split", "score", "rid", alpha_ppm=100_000
    ).collect()[0].asDict()
    # k = ceil(3 * 0.9) = 3 > n_c = 2
    assert got["k_rank"] == 3 and got["qhat"] is None
    assert got["n_covered"] == 2 and got["coverage_ppm"] == 1_000_000

    res = _duck(
        conformal_coverage_sql(
            "SELECT * FROM t", "split", "score", "rid", alpha_ppm=100_000
        ),
        "CREATE TABLE t (split INTEGER, score BIGINT, rid BIGINT)",
        rows,
    )
    want = dict(zip([d[0] for d in res.description], res.fetchall()[0]))
    assert got == want


# --------------------------------------------- quantile treatment effect


def test_qte_exact_and_parity(spark):
    """Type-1 quantiles at 25/50/75 on two 4-row arms shifted by a
    constant 5: k = ⌈q·4⌉ = 1/2/3 selects 10/20/30 vs 15/25/35, QTE
    = 5 at every level; bit-equal with DuckDB."""
    from gis_city_county_spark.operators.mlprep import (
        quantile_treatment_effect,
        quantile_treatment_effect_sql,
    )

    rows = [(0, v, i) for i, v in enumerate([10, 20, 30, 40])] + [
        (1, v, 10 + i) for i, v in enumerate([15, 25, 35, 45])
    ]
    df = spark.createDataFrame(rows, "arm int, v bigint, rid bigint")
    got = [tuple(r) for r in
           quantile_treatment_effect(df, "arm", "v", "rid").collect()]
    assert got == [
        (250000, 4, 4, 10, 15, 5),
        (500000, 4, 4, 20, 25, 5),
        (750000, 4, 4, 30, 35, 5),
    ]
    res = _duck(
        quantile_treatment_effect_sql("SELECT * FROM t", "arm", "v", "rid"),
        "CREATE TABLE t (arm INTEGER, v BIGINT, rid BIGINT)",
        rows,
    )
    assert got == [tuple(r) for r in res.fetchall()]


def test_qte_tiny_and_empty_arms(spark):
    """A 1-row arm maps all three levels to rank 1 (the duplicate-k
    merge must NOT fan out); an empty arm yields NULL quantiles and
    NULL QTE at every level; both DuckDB-bit-equal."""
    from gis_city_county_spark.operators.mlprep import (
        quantile_treatment_effect,
        quantile_treatment_effect_sql,
    )

    rows = [(0, 10, 1), (0, 20, 2), (1, 99, 3)]
    df = spark.createDataFrame(rows, "arm int, v bigint, rid bigint")
    got = [tuple(r) for r in
           quantile_treatment_effect(df, "arm", "v", "rid").collect()]
    assert len(got) == 3  # no fan-out from the shared rank
    assert [g[4] for g in got] == [99, 99, 99]
    res = _duck(
        quantile_treatment_effect_sql("SELECT * FROM t", "arm", "v", "rid"),
        "CREATE TABLE t (arm INTEGER, v BIGINT, rid BIGINT)",
        rows,
    )
    assert got == [tuple(r) for r in res.fetchall()]

    solo = spark.createDataFrame(
        [(0, 10, 1), (0, 30, 2)], "arm int, v bigint, rid bigint"
    )
    out = {r["q_ppm"]: r for r in
           quantile_treatment_effect(solo, "arm", "v", "rid").collect()}
    assert len(out) == 3
    assert all(out[q]["v_t"] is None and out[q]["qte"] is None
               for q in out)
    assert out[500000]["v_c"] == 10  # k = ceil(0.5*2) = 1
