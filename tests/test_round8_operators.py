"""Round-8 tests: the two round-7 dead-code rescues (HLL merge
rollup, generalization ladder) and Fleiss' kappa get the property /
parity coverage their registration requires (VERDICT r7 directive 2,
ADVICE r7), plus a structural guard so an operator with an ``_sql``
twin can never again ship without a caller.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

PKG = Path(__file__).resolve().parent.parent / "gis_city_county_spark"


# ------------------------------------------------- hll_merge_rollup


def _synth_events(spark, n=400):
    """Deterministic (etype, day, uid) rows: uid ranges overlap across
    days so the merged estimate differs from any single day's."""
    rows = [
        (f"t{i % 3}", f"d{(i // 40) % 5}", (i * 7919) % 97)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "etype string, day string, uid long")


def test_hll_merge_rollup_is_bit_identical_to_direct_build(spark):
    """The docstring's exactness claim: register-wise MAX over per-day
    sketches == building the registers over the whole period directly
    (same register_sum, zero count, and raw estimate, bit-for-bit)."""
    from gis_city_county_spark.operators.sketch import (
        hll_distinct,
        hll_merge_rollup,
    )

    df = _synth_events(spark)
    merged = {
        r["etype"]: r
        for r in hll_merge_rollup(df, ["etype"], "day", "uid", p=6).collect()
    }
    direct = {
        r["etype"]: r
        for r in hll_distinct(df, ["etype"], "uid", p=6).collect()
    }
    exact = {
        r["etype"]: r
        for r in df.groupBy("etype")
        .agg(
            F.countDistinct("uid").alias("nd"),
            F.countDistinct("day").alias("ns"),
        )
        .collect()
    }
    assert set(merged) == set(direct) == set(exact)
    for g, row in merged.items():
        assert row["register_sum"] == direct[g]["register_sum"]
        assert row["n_zero_registers"] == direct[g]["n_zero_registers"]
        assert row["hll_raw_est"] == direct[g]["hll_raw_est"]  # bit-exact
        assert row["exact_distinct"] == exact[g]["nd"]
        assert row["n_subunits"] == exact[g]["ns"]


def test_hll_merge_rollup_matches_duckdb_twin(spark):
    from gis_city_county_spark.operators.sketch import (
        hll_merge_rollup,
        hll_merge_rollup_sql,
    )

    df = _synth_events(spark, n=250)
    got = sorted(
        hll_merge_rollup(df, ["etype"], "day", "uid", p=6).collect()
    )
    con = duckdb.connect()
    con.register("ev", df.toPandas())
    want = sorted(
        con.execute(
            hll_merge_rollup_sql("SELECT * FROM ev", ["etype"], "day", "uid", p=6)
        ).fetchall()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


# -------------------------------------------- generalization_ladder


def _ladder_frame(spark):
    # cohort sizes by (a, b): (x, p)=6, (x, q)=2, (y, p)=1;
    # by a: x=8, y=1
    rows = (
        [("x", "p")] * 6 + [("x", "q")] * 2 + [("y", "p")]
    )
    return spark.createDataFrame(rows, "a string, b string")


def test_generalization_ladder_picks_first_satisfying_rung(spark):
    from gis_city_county_spark.operators.privacy import generalization_ladder

    out = {
        (r["a"], r["b"]): r
        for r in generalization_ladder(
            _ladder_frame(spark), [["a", "b"], ["a"]], k=5
        ).collect()
    }
    # (x,p) already satisfies k=5 at the finest rung
    assert out[("x", "p")]["size_l0"] == 6
    assert out[("x", "p")]["chosen_level"] == 0
    # (x,q) needs the coarser rung (size 2 -> 8)
    assert out[("x", "q")]["size_l0"] == 2
    assert out[("x", "q")]["size_l1"] == 8
    assert out[("x", "q")]["chosen_level"] == 1
    # (y,p) never reaches k=5 on any rung -> NULL
    assert out[("y", "p")]["size_l1"] == 1
    assert out[("y", "p")]["chosen_level"] is None


def test_generalization_ladder_sizes_monotone_and_duckdb_parity(spark):
    from gis_city_county_spark.operators.privacy import (
        generalization_ladder,
        generalization_ladder_sql,
    )

    df = _ladder_frame(spark)
    got = generalization_ladder(df, [["a", "b"], ["a"]], k=3).collect()
    # nested rungs: coarser group size always >= finer
    for r in got:
        assert r["size_l1"] >= r["size_l0"]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        generalization_ladder_sql("SELECT * FROM t", [["a", "b"], ["a"]], k=3)
    ).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)


def test_generalization_ladder_rejects_non_subset_levels(spark):
    from gis_city_county_spark.operators.privacy import generalization_ladder

    with pytest.raises(ValueError):
        generalization_ladder(_ladder_frame(spark), [["a"], ["a", "b"]], k=2)


# --------------------------------------------------- fleiss_kappa

# Fleiss (1971) worked example (also the Wikipedia table): 10 items,
# 14 raters, 5 categories; kappa ~= 0.2099.
_FLEISS_TABLE = [
    (0, 0, 0, 0, 14),
    (0, 2, 6, 4, 2),
    (0, 0, 3, 5, 6),
    (0, 3, 9, 2, 0),
    (2, 2, 8, 1, 1),
    (7, 7, 0, 0, 0),
    (3, 2, 6, 3, 0),
    (2, 5, 3, 2, 2),
    (6, 5, 2, 1, 0),
    (0, 2, 2, 3, 7),
]


def _fleiss_long_rows():
    rows = []
    for i, counts in enumerate(_FLEISS_TABLE):
        rater = 0
        for cat, n in enumerate(counts):
            for _ in range(n):
                rows.append((i, rater, f"c{cat}"))
                rater += 1
    return rows


def _expected_fleiss():
    """Same exact-integer numerators and fixed-order IEEE tail as the
    operator, evaluated in Python (all ints < 2**53, so the double
    conversions are exact)."""
    n_items = len(_FLEISS_TABLE)
    r = 14
    a = sum(n * n for row in _FLEISS_TABLE for n in row)
    cols = [sum(row[j] for row in _FLEISS_TABLE) for j in range(5)]
    c = sum(x * x for x in cols)
    n_ratings = n_items * r
    pbar = float(a - n_items * r) / float(n_items * r * (r - 1))
    pe = float(c) / float(n_ratings) / float(n_ratings)
    return (pbar - pe) / (1.0 - pe)


def test_fleiss_kappa_known_value(spark):
    from gis_city_county_spark.operators.mlprep import fleiss_kappa

    df = spark.createDataFrame(
        _fleiss_long_rows(), "item long, rater long, label string"
    )
    row = fleiss_kappa(df, "item", "rater", "label").collect()[0]
    assert row["n_items"] == 10
    assert row["n_ratings"] == 140
    assert row["n_raters"] == 14
    assert row["n_categories"] == 5
    assert row["r_constant"] is True
    assert row["kappa"] == _expected_fleiss()  # fixed-order: bit-exact
    assert abs(row["kappa"] - 0.2099) < 5e-4


def test_fleiss_kappa_matches_duckdb_twin_bit_exact(spark):
    from gis_city_county_spark.operators.mlprep import (
        fleiss_kappa,
        fleiss_kappa_sql,
    )

    df = spark.createDataFrame(
        _fleiss_long_rows(), "item long, rater long, label string"
    )
    got = fleiss_kappa(df, "item", "rater", "label").collect()[0]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        fleiss_kappa_sql("SELECT * FROM t", "item", "rater", "label")
    ).fetchone()
    assert tuple(got) == tuple(want)


def test_fleiss_kappa_degenerate_cases(spark):
    from gis_city_county_spark.operators.mlprep import fleiss_kappa

    # non-constant ratings per item -> r_constant False, kappa NULL
    uneven = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a"), (2, 1, "a")],
        "item long, rater long, label string",
    )
    row = fleiss_kappa(uneven, "item", "rater", "label").collect()[0]
    assert row["r_constant"] is False
    assert row["n_raters"] is None
    assert row["kappa"] is None

    # every rating one label -> Pe = 1 -> kappa NULL (not a crash)
    mono = spark.createDataFrame(
        [(i, r, "same") for i in range(3) for r in range(2)],
        "item long, rater long, label string",
    )
    row = fleiss_kappa(mono, "item", "rater", "label").collect()[0]
    assert row["r_constant"] is True
    assert row["kappa"] is None


# --------------------------------------- cohens_kappa_sql overflow


def test_cohens_kappa_sql_uses_hugeint_numerators():
    """ADVICE r7: the emitted SQL must compute N*A and N*N in HUGEINT
    (int128) — a DECIMAL(18,0) product overflows at n_rows >= ~1e9,
    contradicting the operator's 1e14-row contract."""
    from gis_city_county_spark.operators.mlprep import cohens_kappa_sql

    sql = cohens_kappa_sql("SELECT * FROM t", "a", "b")
    tail = sql[sql.rindex("SELECT") :]
    assert "CAST(n_rows AS HUGEINT) * CAST(n_rows AS HUGEINT)" in tail
    assert "CAST(n_rows AS HUGEINT) * CAST(n_agree AS HUGEINT)" in tail
    assert "DECIMAL(18,0)) * CAST(n_rows" not in tail
    assert "DECIMAL(18,0)) * CAST(n_agree" not in tail


# ------------------------------------------------ dead-code guard


_UNWIRED_ALLOWED: set[str] = set()  # no exceptions today — keep it so


def test_every_sql_twinned_operator_has_a_caller():
    """The r6/r7 pattern (ndcg, hll_merge_rollup, generalization_ladder):
    an operator lands with an ``_sql`` twin but zero callers — a
    correctness claim nothing verifies.  Guard: every public function
    in ``operators/`` that has a ``<name>_sql`` sibling must be CALLED
    somewhere else in the package (a QuerySpec module, streaming twin,
    pipeline, or a composite operator) or appear in the explicit
    allowlist above."""
    pairs: list[tuple[Path, str]] = []
    sources: dict[Path, str] = {
        p: p.read_text() for p in PKG.rglob("*.py")
    }
    for p in sorted((PKG / "operators").glob("*.py")):
        tree = ast.parse(sources[p])
        names = {
            n.name for n in tree.body if isinstance(n, ast.FunctionDef)
        }
        pairs.extend(
            (p, f)
            for f in names
            if not f.startswith("_") and f + "_sql" in names
        )

    dead = []
    for defining, f in pairs:
        if f in _UNWIRED_ALLOWED:
            continue
        call_rx = re.compile(rf"(?<!def )\b{re.escape(f)}\s*\(")
        wired = any(call_rx.search(src) for src in sources.values())
        if not wired:
            dead.append(f"{defining.name}:{f}")
    assert not dead, (
        "operators with an _sql twin but no caller anywhere in the "
        f"package (register a QuerySpec or delete them): {dead}"
    )


# -------------------------------------------------- countmin_delta


def test_countmin_delta_overcount_bound_and_antisymmetry(spark):
    """Count-min never under-counts: est_a >= exact_a and est_b >=
    exact_b for every reported key; swapping the periods negates both
    delta columns."""
    from gis_city_county_spark.operators.sketch import countmin_delta

    a = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(60)], "key string"
    )
    b = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(40)], "key string"
    )
    fwd = countmin_delta(a, b, "key", width=1 << 6, depth=3, k=10).collect()
    assert fwd  # something reported
    for r in fwd:
        assert r["est_a"] >= r["exact_a"]
        assert r["est_b"] >= r["exact_b"]
        assert r["exact_delta"] == r["exact_b"] - r["exact_a"]
        assert r["est_delta"] == r["est_b"] - r["est_a"]
    rev = countmin_delta(b, a, "key", width=1 << 6, depth=3, k=10).collect()
    f = {r["key"]: r for r in fwd}
    g = {r["key"]: r for r in rev}
    assert set(f) == set(g)  # same |delta| ranking either direction
    for k in f:
        assert g[k]["exact_delta"] == -f[k]["exact_delta"]
        assert g[k]["est_delta"] == -f[k]["est_delta"]


def test_countmin_delta_exact_when_collision_free(spark):
    """With width far above key cardinality the sketch is collision-
    free and every estimate equals the exact count (incl. keys absent
    from one period: empty buckets -> 0)."""
    from gis_city_county_spark.operators.sketch import countmin_delta

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "key string")
    b = spark.createDataFrame([("y",), ("y",), ("z",)], "key string")
    rows = {
        r["key"]: r
        for r in countmin_delta(a, b, "key", width=1 << 12, depth=4, k=10)
        .collect()
    }
    assert rows["x"]["exact_a"] == 2 and rows["x"]["exact_b"] == 0
    assert rows["x"]["est_a"] == 2 and rows["x"]["est_b"] == 0
    assert rows["z"]["exact_delta"] == 1 and rows["z"]["est_delta"] == 1
    assert rows["y"]["exact_delta"] == 1


# ------------------------------------------ cluster_size_histogram


def test_cluster_size_histogram_planted_clusters(spark):
    """Planted duplicate groups of size 3, 2 and a singleton: the
    histogram reports exactly one cluster per size, doc totals sum,
    and removable = size-1 per cluster."""
    from gis_city_county_spark.operators.dedup import cluster_size_histogram

    t_a = "alpha beta gamma delta epsilon zeta"
    t_b = "one two three four five six seven"
    t_u = "completely different unique tokens here now"
    docs = spark.createDataFrame(
        [(1, t_a), (2, t_a), (3, t_a), (4, t_b), (5, t_b), (6, t_u)],
        "doc_id long, text string",
    )
    hist = {
        r["cluster_size"]: r
        for r in cluster_size_histogram(docs, "doc_id", "text").collect()
    }
    assert set(hist) == {1, 2, 3}
    assert hist[3]["n_clusters"] == 1 and hist[3]["n_removable"] == 2
    assert hist[2]["n_clusters"] == 1 and hist[2]["n_removable"] == 1
    assert hist[1]["n_clusters"] == 1 and hist[1]["n_removable"] == 0
    assert sum(r["n_docs"] for r in hist.values()) == 6


# ---------------------------------------------------- token_drift


def test_token_drift_known_shares_and_vanishing_token(spark):
    from gis_city_county_spark.operators.corpus import token_drift

    a = spark.createDataFrame(
        [(1, "a a a b"), (2, "gone")], "id long, text string"
    )
    b = spark.createDataFrame([(3, "a b b b"), (4, "b")], "id long, text string")
    rows = {r["tok"]: r for r in token_drift(a, b, "text", k=10).collect()}
    # totals: A=5 tokens, B=5 tokens
    assert rows["a"]["ppm_a"] == 600_000 and rows["a"]["ppm_b"] == 200_000
    assert rows["a"]["drift_ppm"] == -400_000
    assert rows["b"]["ppm_a"] == 200_000 and rows["b"]["ppm_b"] == 800_000
    assert rows["b"]["drift_ppm"] == 600_000
    # token present only in A: share collapses to exactly 0
    assert rows["gone"]["cnt_b"] == 0 and rows["gone"]["ppm_b"] == 0
    assert rows["gone"]["drift_ppm"] == -200_000
    # ranking: largest |drift| first, full coverage at k >= vocab
    assert set(rows) == {"a", "b", "gone"}


# --------------------------------------------------- matthews_corr


def test_matthews_corr_perfect_inverted_known_and_degenerate(spark):
    from gis_city_county_spark.operators.mlprep import matthews_corr

    perfect = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 5, "y boolean, p boolean"
    )
    assert matthews_corr(perfect, "y", "p").collect()[0]["mcc"] == 1.0

    # inverted: tp=0 fp=5 tn=0 fn=3 — the paired-sqrt denominator is
    # sqrt(15)*sqrt(15), one ulp off exact 15, so mcc is one ulp off
    # -1 by design; assert the operator's own fixed-order value
    import math

    inverted = spark.createDataFrame(
        [(True, False)] * 3 + [(False, True)] * 5, "y boolean, p boolean"
    )
    want_inv = float(0 * 0 - 5 * 3) / (
        math.sqrt(float(5 * 3)) * math.sqrt(float(5 * 3))
    )
    got_inv = matthews_corr(inverted, "y", "p").collect()[0]["mcc"]
    assert got_inv == want_inv
    assert abs(got_inv - (-1.0)) < 1e-15

    # known 2x2: tp=5 fp=2 tn=4 fn=1, same fixed-order IEEE tail

    rows = (
        [(True, True)] * 5 + [(False, True)] * 2
        + [(False, False)] * 4 + [(True, False)] * 1
    )
    df = spark.createDataFrame(rows, "y boolean, p boolean")
    got = matthews_corr(df, "y", "p").collect()[0]
    assert (got["tp"], got["fp"], got["tn"], got["fn"]) == (5, 2, 4, 1)
    want = float(5 * 4 - 2 * 1) / (
        math.sqrt(float((5 + 2) * (5 + 1))) * math.sqrt(float((4 + 2) * (4 + 1)))
    )
    assert got["mcc"] == want  # bit-exact: fixed order, exact ints

    # degenerate: classifier always says true -> tn + fn = 0 -> NULL
    onesided = spark.createDataFrame(
        [(True, True), (False, True)], "y boolean, p boolean"
    )
    assert matthews_corr(onesided, "y", "p").collect()[0]["mcc"] is None


def test_matthews_corr_matches_duckdb_twin_bit_exact(spark):
    from gis_city_county_spark.operators.mlprep import (
        matthews_corr,
        matthews_corr_sql,
    )

    rows = [(i % 3 == 0, i % 7 < 3) for i in range(200)]
    df = spark.createDataFrame(rows, "y boolean, p boolean")
    got = matthews_corr(df, "y", "p").collect()[0]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        matthews_corr_sql("SELECT * FROM t", "y", "p")
    ).fetchone()
    assert tuple(got) == tuple(want)


# ------------------------------------------------- blocking_recall


def test_blocking_recall_planted_duplicates_full_recall(spark):
    """Identical documents share every band, so LSH recall over exact
    duplicates must be 1e6 ppm; the zero-truth frame yields NULL
    recall instead of a division error (the ANSI-mode regression this
    test pins)."""
    from gis_city_county_spark.operators.dedup import blocking_recall

    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight nine"
    docs = spark.createDataFrame(
        [(1, t_a), (2, t_a), (3, t_b), (4, t_b), (5, "lone wolf text here")],
        "doc_id long, text string",
    )
    row = blocking_recall(
        docs, "doc_id", "text", sample_fraction=1.0
    ).collect()[0]
    assert row["n_docs_sampled"] == 5
    assert row["n_truth_pairs"] == 2       # (1,2) and (3,4)
    assert row["n_hit"] == 2
    assert row["recall_ppm"] == 1_000_000
    assert row["precision_ppm"] is not None

    disjoint = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh")], "doc_id long, text string"
    )
    row = blocking_recall(
        disjoint, "doc_id", "text", sample_fraction=1.0
    ).collect()[0]
    assert row["n_truth_pairs"] == 0
    assert row["recall_ppm"] is None  # NULL, not DIVIDE_BY_ZERO


# -------------------------------------------------- reach_summary


def test_reach_summary_chain_and_isolated_source(spark):
    from gis_city_county_spark.operators.graph import reach_summary

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    row = reach_summary(chain, 1, 3).collect()[0]
    assert row["n_reached"] == 3
    assert row["eccentricity_capped"] == 3
    # 1e6/1 + 1e6 div 2 + 1e6 div 3 = 1000000 + 500000 + 333333
    assert row["harmonic_ppm"] == 1_833_333

    # max_hops caps the reach (and the harmonic sum with it)
    row = reach_summary(chain, 1, 1).collect()[0]
    assert row["n_reached"] == 1 and row["harmonic_ppm"] == 1_000_000

    isolated = reach_summary(chain, 99, 3).collect()[0]
    assert isolated["n_reached"] == 0
    assert isolated["eccentricity_capped"] is None
    assert isolated["harmonic_ppm"] is None


# ---------------------------------------------- cumulative_distinct


def test_cumulative_distinct_first_seen_rewrite(spark):
    """Returning users never re-count; the curve is the running sum of
    first appearances; the day column is TIMESTAMP-typed (driver hash
    convention)."""
    from pyspark.sql.types import TimestampType

    from gis_city_county_spark.operators.temporal import cumulative_distinct

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (2, "2024-01-01 11:00:00"),
            (1, "2024-01-02 09:00:00"),   # returning: not new
            (3, "2024-01-03 08:00:00"),
            (2, "2024-01-03 09:30:00"),   # returning
            (4, "2024-01-03 10:00:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = cumulative_distinct(ev, "user_id", "ts")
    assert isinstance(out.schema["day"].dataType, TimestampType)
    rows = {r["day"].strftime("%Y-%m-%d"): r for r in out.collect()}
    assert set(rows) == {"2024-01-01", "2024-01-03"}  # Jan 2 added nobody
    assert rows["2024-01-01"]["n_new"] == 2
    assert rows["2024-01-01"]["cum_distinct"] == 2
    assert rows["2024-01-03"]["n_new"] == 2
    assert rows["2024-01-03"]["cum_distinct"] == 4


# ---------------------------------------------- decayed_engagement


def test_decayed_engagement_dyadic_weights_exact(spark):
    """Ages 0 / 7 / 14 days at half-life 7 weigh 1, 1/2, 1/4 — the
    scaled sum and its floor normalization are exact integers; NULL
    values drop; ages beyond max_buckets fold into the final bucket."""
    from gis_city_county_spark.operators.temporal import decayed_engagement

    ev = spark.createDataFrame(
        [
            ("a", "2024-01-31 12:00:00", 1.0),   # age 0  -> weight 1
            ("a", "2024-01-24 12:00:00", 1.0),   # age 7  -> 1/2
            ("a", "2024-01-17 12:00:00", 1.0),   # age 14 -> 1/4
            ("a", "2024-01-20 00:00:00", None),  # NULL: dropped
            ("b", "2020-01-01 00:00:00", 8.0),   # ancient: final bucket
        ],
        "g string, ts_s string, value double",
    ).select("g", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    rows = {
        r["g"]: r
        for r in decayed_engagement(
            ev, "g", "ts", "value", horizon="2024-01-31",
            half_life_days=7, max_buckets=8,
        ).collect()
    }
    # note: horizon - '2024-01-31 12:00' is age 0 via the DATE cast
    assert rows["a"]["n_events"] == 3
    assert rows["a"]["decayed_milli_scaled"] == 1000 * (256 + 128 + 64)
    assert rows["a"]["decayed_milli"] == 1750  # 1 + 1/2 + 1/4 in milli
    # ancient event: shift 0, weight 2^-8 of 8.0 = 31.25 milli -> floor 31
    assert rows["b"]["decayed_milli_scaled"] == 8000
    assert rows["b"]["decayed_milli"] == 31


def test_decayed_engagement_matches_duckdb_twin(spark):
    from gis_city_county_spark.operators.temporal import (
        decayed_engagement,
        decayed_engagement_sql,
    )

    ev = spark.createDataFrame(
        [
            (f"g{i % 2}", f"2024-01-{(i % 28) + 1:02d} 06:00:00",
             round(0.37 * i, 2))
            for i in range(100)
        ],
        "g string, ts_s string, value double",
    ).select("g", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    got = sorted(
        tuple(r)
        for r in decayed_engagement(
            ev, "g", "ts", "value", horizon="2024-01-31"
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", ev.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            decayed_engagement_sql(
                "SELECT * FROM t", "g", "ts", "value", horizon="2024-01-31"
            )
        ).fetchall()
    )
    assert got == want


# --------------------------------------------------------- patch_plan


def test_patch_plan_geometry(spark):
    """Pad-to-patch geometry over a real decoded BMP: a 5x3 image at
    patch 2 needs (1,1) padding, a 3x3 grid, 9 patches, 10 tokens;
    an exactly-divisible image needs zero padding."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import (
        encode_bmp,
        patch_plan,
    )

    imgs = [
        (1, np.zeros((3, 5, 3), dtype=np.uint8)),   # h=3, w=5
        (2, np.zeros((4, 6, 3), dtype=np.uint8)),   # divisible by 2
    ]
    df = spark.createDataFrame(
        [(i, bytearray(encode_bmp(a))) for i, a in imgs],
        "img_id long, payload binary",
    )
    rows = {r["img_id"]: r for r in patch_plan(df, "img_id", "payload", patch=2).collect()}
    r1 = rows[1]
    assert (r1["width"], r1["height"]) == (5, 3)
    assert (r1["pad_w"], r1["pad_h"]) == (1, 1)
    assert (r1["n_patch_x"], r1["n_patch_y"]) == (3, 2)
    assert r1["n_patches"] == 6 and r1["n_tokens"] == 7
    r2 = rows[2]
    assert (r2["pad_w"], r2["pad_h"]) == (0, 0)
    assert r2["n_patches"] == 6 and r2["n_tokens"] == 7


# ----------------------------------------------------- sentence_stats


def test_sentence_stats_segmentation_rules(spark):
    """Terminal-punctuation runs split; unpunctuated text is one
    sentence; empty fragments drop; counts are exact."""
    from gis_city_county_spark.operators.textstats import sentence_stats

    df = spark.createDataFrame(
        [
            ("en", "One two three. Four five! Six?"),   # 3 sentences, 6 words
            ("en", "no terminal punctuation here"),      # 1 sentence, 4 words
            ("fr", "Un. Deux... Trois."),                # 3 sentences, 3 words
        ],
        "lang string, text string",
    )
    rows = {r["lang"]: r for r in sentence_stats(df, "lang", "text").collect()}
    en = rows["en"]
    assert en["n_docs"] == 2
    assert en["n_sentences"] == 4
    assert en["n_sentence_words"] == 10
    assert en["words_per_sentence_milli"] == 2500
    assert en["max_sentence_words"] == 4
    fr = rows["fr"]
    assert fr["n_sentences"] == 3 and fr["n_sentence_words"] == 3
    assert fr["words_per_sentence_milli"] == 1000


def test_sentence_stats_matches_duckdb_twin(spark):
    from gis_city_county_spark.operators.textstats import (
        sentence_stats,
        sentence_stats_sql,
    )

    df = spark.createDataFrame(
        [
            (f"l{i % 2}",
             " ".join(f"w{j}{'.' if j % 3 == 2 else ''}" for j in range(i + 1)))
            for i in range(40)
        ],
        "lang string, text string",
    )
    got = sorted(tuple(r) for r in sentence_stats(df, "lang", "text").collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            sentence_stats_sql("documents", "lang", "text")
        ).fetchall()
    )
    assert got == want


# ----------------------------------------- review-driven regressions


def test_sentence_stats_newline_separated_prose(spark):
    """Newline/tab-separated sentences must not create phantom
    fragments or phantom empty words (trim() strips only spaces —
    the round-8 review catch)."""
    from gis_city_county_spark.operators.textstats import (
        sentence_stats,
        sentence_stats_sql,
    )

    df = spark.createDataFrame(
        [
            ("en", "One two.\nThree four."),   # newline between sentences
            ("en", "Ein wort.\n"),             # trailing newline fragment
            ("en", "Tab\tsep words. Next!\t"),
        ],
        "lang string, text string",
    )
    row = sentence_stats(df, "lang", "text").collect()[0]
    assert row["n_sentences"] == 2 + 1 + 2
    assert row["n_sentence_words"] == 4 + 2 + 4
    assert row["max_sentence_words"] == 3  # 'Tab sep words'
    # and the DuckDB twin agrees on the same tricky strings
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = con.execute(
        sentence_stats_sql("documents", "lang", "text")
    ).fetchone()
    assert tuple(row) == tuple(want)


def test_decayed_engagement_future_event_clamps_to_weight_one(spark):
    """An event after the horizon (clock skew) counts at weight 1 —
    never above — and far-future events neither wrap Spark's shift
    nor crash the DuckDB twin (the round-8 review catch)."""
    from gis_city_county_spark.operators.temporal import (
        decayed_engagement,
        decayed_engagement_sql,
    )

    ev = spark.createDataFrame(
        [
            ("a", "2024-02-20 00:00:00", 1.0),   # 20 days AFTER horizon
            ("a", "2025-04-01 00:00:00", 1.0),   # ~60 half-lives future
        ],
        "g string, ts_s string, value double",
    ).select("g", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    row = decayed_engagement(
        ev, "g", "ts", "value", horizon="2024-01-31"
    ).collect()[0]
    assert row["decayed_milli_scaled"] == 2 * 1000 * 256  # weight 1 each
    assert row["decayed_milli"] == 2000
    con = duckdb.connect()
    con.register("t", ev.toPandas())
    want = con.execute(
        decayed_engagement_sql(
            "SELECT * FROM t", "g", "ts", "value", horizon="2024-01-31"
        )
    ).fetchone()
    assert tuple(row) == tuple(want)


def test_matthews_corr_unparseable_values_drop_before_n_rows(spark):
    """Strings that don't parse as booleans drop BEFORE n_rows (and
    don't crash the DuckDB twin's cast) — the round-8 review catch."""
    from gis_city_county_spark.operators.mlprep import (
        matthews_corr,
        matthews_corr_sql,
    )

    df = spark.createDataFrame(
        [("true", "true"), ("false", "true"), ("O", "true"), ("F", "false")],
        "y string, p string",
    )
    row = matthews_corr(df, "y", "p").collect()[0]
    # 'O' parses on NEITHER engine (dropped before n_rows); 'F' is
    # false on BOTH (shared t/f lexicon) — so 3 rows remain and the
    # cells always sum to n_rows (the pre-fix bug counted 'O' in
    # n_rows while losing it from the cells)
    assert row["n_rows"] == 3
    assert row["tp"] + row["fp"] + row["tn"] + row["fn"] == row["n_rows"]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        matthews_corr_sql("SELECT * FROM t", "y", "p")
    ).fetchone()
    assert tuple(row) == tuple(want)


def test_scaling_probe_only_merges_or_refuses(tmp_path):
    """--only merges into a same-factor artifact; at a non-matching
    factor it must REFUSE to write (a rewrite would silently drop
    every prior row) unless --no-write."""
    import json as _json

    from scaling_probe import merge_results

    art = tmp_path / "BENCH_SCALING.json"
    art.write_text(_json.dumps(
        {"factor": 8, "queries": {"old": {"x_linear": 0.5}}}
    ))
    merged = merge_results(
        {"new": {"x_linear": 0.7}}, str(art), only=True, factor=8,
        no_write=False,
    )
    assert set(merged) == {"old", "new"}  # prior rows survive
    with pytest.raises(SystemExit):
        merge_results(
            {"new": {}}, str(art), only=True, factor=16, no_write=False
        )
    # exploratory factor with --no-write is allowed (nothing written)
    out = merge_results(
        {"new": {}}, str(art), only=True, factor=16, no_write=True
    )
    assert set(out) == {"new"}


# ---------------------------------------------- join_fanout_histogram


def test_join_fanout_histogram_counts_zero_children(spark):
    from gis_city_county_spark.operators.profile import (
        join_fanout_histogram,
        join_fanout_histogram_sql,
    )

    parents = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pk long")
    children = spark.createDataFrame(
        [(1,), (2,), (2,), (2,)], "fk long"
    )
    hist = {
        r["fanout"]: r
        for r in join_fanout_histogram(parents, children, "pk", "fk").collect()
    }
    assert hist[0]["n_parents"] == 2      # 3 and 4: inner-join droppers
    assert hist[1]["n_parents"] == 1
    assert hist[3]["n_parents"] == 1 and hist[3]["n_children"] == 3
    # the orphan row is ALWAYS present (0 children here)
    assert hist[None]["n_children"] == 0

    def _key(t):
        return (t[0] is None, t[0] if t[0] is not None else -1)

    con = duckdb.connect()
    con.register("p", parents.toPandas())
    con.register("c", children.toPandas())
    want = sorted(
        [
            tuple(r)
            for r in con.execute(
                join_fanout_histogram_sql(
                    "SELECT * FROM p", "SELECT * FROM c", "pk", "fk"
                )
            ).fetchall()
        ],
        key=_key,
    )
    got = sorted([tuple(r) for r in hist.values()], key=_key)
    assert got == want


# ---------------------------------------------- cosine_pair_histogram


def test_cosine_pair_histogram_known_geometry(spark):
    """Parallel vectors land in bucket 1000, antiparallel in -1000,
    orthogonal in 0; probe_fraction=1.0 pairs every (a<b) once."""
    from gis_city_county_spark.operators.similarity import (
        cosine_pair_histogram,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [2.0, 0.0]),    # parallel to 1
            (3, [0.0, 1.0]),    # orthogonal to 1,2
            (4, [-1.0, 0.0]),   # antiparallel to 1,2
        ],
        "vec_id long, embedding array<float>",
    )
    hist = {
        r["bucket_milli"]: r["n_pairs"]
        for r in cosine_pair_histogram(
            df, "vec_id", "embedding", probe_fraction=1.0
        ).collect()
    }
    # pairs: (1,2)=1.0, (1,3)=0, (1,4)=-1, (2,3)=0, (2,4)=-1, (3,4)=0
    assert hist[1000] == 1
    assert hist[0] == 3
    assert hist[-1000] == 2
    assert sum(hist.values()) == 6


# ---------------------------------------------- position_attribution


def _attr_frames(spark, rows_conv, rows_touch):
    conv = spark.createDataFrame(
        [(i, u, t) for i, u, t in rows_conv],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    touch = spark.createDataFrame(
        [(i, u, t, ch) for i, u, t, ch in rows_touch],
        "event_id long, user_id long, ts_s string, channel string",
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"), "channel",
    )
    return conv, touch


def test_position_attribution_u_shape_and_remainder(spark):
    from gis_city_county_spark.operators.temporal import position_attribution

    conv, touch = _attr_frames(
        spark,
        [(100, 1, "2024-01-10 12:00:00"),   # 5-touch path
         (200, 2, "2024-01-10 12:00:00"),   # 2-touch path
         (300, 3, "2024-01-10 12:00:00")],  # no touches -> none
        [(i, 1, f"2024-01-10 0{i}:00:00", f"ch{i}") for i in range(1, 6)]
        + [(11, 2, "2024-01-10 08:00:00", "a"),
           (12, 2, "2024-01-10 09:00:00", "b")],
    )
    rows = {
        r["channel"]: r
        for r in position_attribution(
            conv, touch, ["user_id"], "event_id", "ts", "ts",
            "channel", "event_id",
        ).collect()
    }
    # 5 touches: first 400, middles 200 div 3 = 66, last 400 + 200%3=2
    assert rows["ch1"]["credit_milli"] == 400
    assert rows["ch2"]["credit_milli"] == 66
    assert rows["ch5"]["credit_milli"] == 402
    # 2 touches: 500/500
    assert rows["a"]["credit_milli"] == 500
    assert rows["b"]["credit_milli"] == 500
    assert rows["none"]["credit_milli"] == 1000
    # invariant: total credit == 1000 per conversion
    assert sum(r["credit_milli"] for r in rows.values()) == 3000


def test_position_attribution_matches_duckdb_twin(spark):
    from gis_city_county_spark.operators.temporal import (
        position_attribution,
        position_attribution_sql,
    )

    conv, touch = _attr_frames(
        spark,
        [(100 + i, i % 3, f"2024-01-10 {10 + i % 8}:00:00") for i in range(12)],
        [(200 + i, i % 3, f"2024-01-10 {6 + i % 10}:30:00", f"c{i % 4}")
         for i in range(24)],
    )
    got = sorted(
        tuple(r)
        for r in position_attribution(
            conv, touch, ["user_id"], "event_id", "ts", "ts",
            "channel", "event_id",
        ).collect()
    )
    con = duckdb.connect()
    con.register("conv", conv.toPandas())
    con.register("touch", touch.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            position_attribution_sql(
                "SELECT * FROM conv", "SELECT * FROM touch",
                ["user_id"], "event_id", "ts", "ts", "channel", "event_id",
            )
        ).fetchall()
    )
    assert got == want


# ------------------------------------------- degree_assortativity


def test_degree_assortativity_star_vs_regular(spark):
    """A star graph is maximally disassortative (hub meets leaves
    only: r = -1 exactly for the 2-degree-value case); a cycle is
    degree-regular so the variance is zero and r is NULL."""
    from gis_city_county_spark.operators.graph import degree_assortativity

    # symmetric star: hub 0 <-> leaves 1..5
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)],
        "src long, dst long",
    )
    row = degree_assortativity(star).collect()[0]
    assert row["n_edges"] == 10
    assert abs(row["assortativity"] - (-1.0)) < 1e-12

    cycle = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)]
        + [((i + 1) % 5, i) for i in range(5)],
        "src long, dst long",
    )
    row = degree_assortativity(cycle).collect()[0]
    assert row["assortativity"] is None  # zero variance: regular graph


def test_degree_assortativity_matches_duckdb_twin(spark):
    from gis_city_county_spark.operators.graph import (
        degree_assortativity,
        degree_assortativity_sql,
    )

    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 11) for i in range(60) if i % 7 != (i * 3) % 11],
        "src long, dst long",
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    got = degree_assortativity(sym).collect()[0]
    con = duckdb.connect()
    con.register("e", sym.toPandas())
    want = con.execute(
        degree_assortativity_sql("SELECT * FROM e")
    ).fetchone()
    assert tuple(got) == tuple(want)


# -------------------------------------------- expected_calibration_error


def test_ece_exact_numerator_and_perfect_calibration(spark):
    """ECE collapses to sum|sp_b - 1000*pos_b| / (1000*N): verified on
    a hand-built two-bin fixture, and a perfectly calibrated column
    (pred always 1000*label... expressed within milli range) scores
    near zero with the worst-bin gap matching."""
    from gis_city_county_spark.operators.mlprep import (
        expected_calibration_error,
        expected_calibration_error_sql,
    )

    # bin 0 (preds 0..99): two rows pred 100*0+50 -> sp=100, pos=1
    # bin 9 (preds 900..999): two rows pred 950 -> sp=1900, pos=2
    df = spark.createDataFrame(
        [(50, False), (50, True), (950, True), (950, True)],
        "pred_milli long, label boolean",
    )
    row = expected_calibration_error(df, "pred_milli", "label").collect()[0]
    assert row["n_rows"] == 4 and row["n_bins_used"] == 2
    # bin0 dev = |100 - 1000| = 900; bin9 dev = |1900 - 2000| = 100
    assert row["ece_numerator"] == 1000
    assert row["ece"] == 1000.0 / 1000.0 / 4.0
    # worst bin: bin0 gap = 900*1000 div 2 = 450000 ppm
    assert row["max_bin_gap_ppm"] == 450_000
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        expected_calibration_error_sql("t", "pred_milli", "label")
    ).fetchone()
    assert tuple(row) == tuple(want)


# --------------------------------------------------- case_profile


def test_case_profile_shouting_detector(spark):
    from gis_city_county_spark.operators.textstats import (
        case_profile,
        case_profile_sql,
    )

    df = spark.createDataFrame(
        [
            ("en", "BUY NOW!!! AMAZING DEAL"),   # shouting
            ("en", "a normal Sentence here"),
            ("en", "1234 --- 5678"),             # zero letters
        ],
        "lang string, text string",
    )
    row = case_profile(df, "lang", "text").collect()[0]
    assert row["n_docs"] == 3
    assert row["n_shouting_docs"] == 1
    # letters: doc1 'BUY NOW AMAZING DEAL' = 17 upper; doc2
    # 'a normal Sentence here' = 1 upper + 18 lower; doc3 0
    assert row["n_upper"] == 17 + 1
    assert row["n_letters"] == 17 + 19
    assert row["upper_ppm"] == (18 * 1_000_000) // 36
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    want = con.execute(
        case_profile_sql("documents", "lang", "text")
    ).fetchone()
    assert tuple(row) == tuple(want)

    # all-numeric group: zero letters -> NULL upper_ppm, no crash
    nums = spark.createDataFrame(
        [("x", "123 456"), ("x", "789")], "lang string, text string"
    )
    r = case_profile(nums, "lang", "text").collect()[0]
    assert r["n_letters"] == 0 and r["upper_ppm"] is None


# ------------------------------------- second-review regressions


def test_degree_assortativity_directed_star_and_sink_edges(spark):
    """Directed graphs must not drop edges into pure sinks (the
    src-only degree join returned ZERO rows on a directed star) —
    degrees now count both endpoints."""
    from gis_city_county_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    rows = degree_assortativity(star).collect()
    assert len(rows) == 1
    assert rows[0]["n_edges"] == 5  # every edge survives
    # du constant (hub=5) -> zero variance -> NULL, not a wrong number
    assert rows[0]["assortativity"] is None

    mixed = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 9)], "src long, dst long"
    )
    row = degree_assortativity(mixed).collect()[0]
    assert row["n_edges"] == 3  # the 1->9 sink edge counts


def test_join_fanout_histogram_orphan_children_cross_foot(spark):
    """Dangling / NULL-FK children land in the always-present NULL
    fanout row, so SUM(n_children) cross-foots with |child|."""
    from gis_city_county_spark.operators.profile import (
        join_fanout_histogram,
        join_fanout_histogram_sql,
    )

    parents = spark.createDataFrame([(1,), (2,)], "pk long")
    children = spark.createDataFrame(
        [(1,), (99,), (None,)], "fk long"
    )
    rows = join_fanout_histogram(parents, children, "pk", "fk").collect()
    by_fanout = {r["fanout"]: r for r in rows}
    assert by_fanout[None]["n_parents"] == 0
    assert by_fanout[None]["n_children"] == 2  # fk 99 + NULL fk
    assert sum(r["n_children"] for r in rows) == 3  # == |child|
    con = duckdb.connect()
    con.register("p", parents.toPandas())
    con.register("c", children.toPandas())
    def _key(t):
        return (t[0] is None, t[0] if t[0] is not None else -1)

    want = sorted(
        [
            (r[0], r[1], r[2])
            for r in con.execute(
                join_fanout_histogram_sql(
                    "SELECT * FROM p", "SELECT * FROM c", "pk", "fk"
                )
            ).fetchall()
        ],
        key=_key,
    )
    got = sorted(
        [(r["fanout"], r["n_parents"], r["n_children"]) for r in rows],
        key=_key,
    )
    assert got == want


def test_streaming_distinct_folder_string_keys(spark, tmp_path):
    """The empty-state schema derives from the batch — string keys
    must not hit a hardcoded long-typed join."""
    from gis_city_county_spark.streaming.distinct import (
        distinct_batch_folder,
    )

    state_dir = str(tmp_path / "state")
    curve_dir = str(tmp_path / "curves")
    fold = distinct_batch_folder(state_dir, curve_dir, "user", "ts")
    b0 = spark.createDataFrame(
        [("user_a", "2024-01-05 10:00:00"), ("user_b", "2024-01-06 11:00:00")],
        "user string, ts_s string",
    ).select("user", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b0, 0)
    rows = spark.read.parquet(curve_dir).collect()
    assert sum(r["n_new"] for r in rows) == 2
