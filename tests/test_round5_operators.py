"""Property and invariant tests for the round-5 operators — brute-force
references in plain Python, mathematical identities, and planted
fixtures with known ground truth."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def test_average_precision_matches_bruteforce(spark):
    """AP must equal the rank-walk reference on seeded random data,
    including duplicate scores resolved by the (score, id) order."""
    from gis_city_county_spark.operators.mlprep import average_precision

    rng = random.Random(7)
    rows = [(i, rng.choice([1.0, 2.0, 3.0, rng.random() * 3]),
             rng.random() < 0.3) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, score double, label boolean")
    got = average_precision(df, "score", "label", "id").collect()[0]

    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum = 0
    sum_ppm = 0
    n_pos = 0
    for k, (_, _, lab) in enumerate(order, start=1):
        if lab:
            cum += 1
            n_pos += 1
            sum_ppm += (cum * 1_000_000) // k
    assert got["n"] == len(rows)
    assert got["n_pos"] == n_pos
    assert got["sum_prec_ppm"] == sum_ppm
    assert got["ap_ppm"] == sum_ppm // n_pos
    assert abs(got["ap"] - sum_ppm / n_pos) < 1e-9


def test_mrr_matches_bruteforce_and_drops_null_groups(spark):
    from gis_city_county_spark.operators.mlprep import mean_reciprocal_rank

    rng = random.Random(11)
    rows = [(rng.randrange(20) if rng.random() > 0.05 else None,
             rng.random(), i, rng.random() < 0.25) for i in range(400)]
    df = spark.createDataFrame(
        rows, "g long, score double, id long, label boolean"
    )
    got = mean_reciprocal_rank(df, "g", "score", "label", "id").collect()[0]

    by_g: dict[int, list] = {}
    for g, s, i, lab in rows:
        if g is None:
            continue
        by_g.setdefault(g, []).append((s, i, lab))
    sum_ppm = 0
    answered = 0
    for g, items in by_g.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for k, (_, _, lab) in enumerate(items, start=1):
            if lab:
                sum_ppm += 1_000_000 // k
                answered += 1
                break
    assert got["n_queries"] == len(by_g)
    assert got["n_answered"] == answered
    assert got["sum_rr_ppm"] == sum_ppm


def test_hll_accuracy_and_partition_independence(spark):
    """The raw estimate must sit within the textbook 3-sigma relative
    error (1.04/sqrt(m)) for cardinalities well above the small-range
    regime, and registers must not depend on partitioning."""
    from gis_city_county_spark.operators.sketch import hll_distinct

    p = 8
    m = 1 << p
    for true_n in (2_000, 20_000):
        df = spark.createDataFrame(
            [("g", f"v{i}") for i in range(true_n)], "g string, v string"
        )
        est = hll_distinct(df, ["g"], "v", p=p).collect()[0]["hll_raw_est"]
        rel = abs(est - true_n) / true_n
        assert rel < 3 * 1.04 / math.sqrt(m), (true_n, est, rel)
        # partition independence: same rows, different layout
        est2 = hll_distinct(df.repartition(17), ["g"], "v", p=p).collect()[0][
            "hll_raw_est"
        ]
        assert est == est2


def test_brier_decomposition_identity(spark):
    """Murphy identity: reliability − resolution + uncertainty must
    equal the directly-computed Brier score up to binning (exact for
    bin-constant predictions, which milli-deciles make true when every
    prediction sits at its bin's mean)."""
    from gis_city_county_spark.operators.mlprep import brier_decomposition

    rng = random.Random(3)
    # predictions constant within each decile bin: pred = bin*100+50
    rows = []
    for i in range(2_000):
        b = rng.randrange(10)
        pred = b * 100 + 50
        rows.append((pred, rng.random() < (pred / 1000.0)))
    df = spark.createDataFrame(rows, "pred_milli long, label boolean")
    out = brier_decomposition(df, "pred_milli", "label", n_bins=10).collect()[0]
    brier_direct = sum(
        ((pm / 1000.0) - (1.0 if lab else 0.0)) ** 2 for pm, lab in rows
    ) / len(rows)
    assert abs(out["brier"] - brier_direct) < 1e-9
    assert out["resolution"] >= -1e-12 and out["reliability"] >= -1e-12


def test_winsorize_matches_python_reference(spark):
    from gis_city_county_spark.operators.mlprep import winsorize_stats

    rng = random.Random(5)
    rows = [(i, "g", rng.randrange(1000)) for i in range(250)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = winsorize_stats(df, "g", "v", "id").collect()[0]

    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    n = len(ordered)
    klo = (n * 5 + 99) // 100
    khi = (n * 95 + 99) // 100
    lo, hi = ordered[klo - 1][2], ordered[khi - 1][2]
    wsum = sum(max(lo, min(hi, v)) for _, _, v in rows)
    assert (got["n"], got["lo_cut"], got["hi_cut"], got["win_sum"]) == (
        n, lo, hi, wsum,
    )


def test_temperature_mixture_invariants(spark):
    """Weights sum to 1; alpha<1 compresses the ratio between head and
    tail sources (the whole point of temperature flattening)."""
    from gis_city_county_spark.operators.corpus import temperature_mixture

    rows = [("big", 10_000), ("mid", 1_000), ("small", 100)]
    df = spark.createDataFrame(
        [(s, w, 1) for s, w in rows for _ in range(1)], "src string, w long, x int"
    )
    out = {
        r["src"]: r
        for r in temperature_mixture(df, "src", "w", alpha=0.5).collect()
    }
    total_w = sum(r["w_norm"] for r in out.values())
    assert abs(total_w - 1.0) < 1e-12
    raw_ratio = out["big"]["p_raw"] / out["small"]["p_raw"]
    w_ratio = out["big"]["w_norm"] / out["small"]["w_norm"]
    assert w_ratio < raw_ratio  # flattened
    assert abs(w_ratio - math.sqrt(raw_ratio)) < 1e-9  # alpha = 1/2 exactly

    with pytest.raises(ValueError):
        temperature_mixture(df, "src", "w", alpha=0.3)


def test_containment_detects_planted_subset(spark):
    """A document fully embedded in a longer one must surface with
    containment 1e6 ppm even though its Jaccard vs the container is
    low; unrelated docs must not pair."""
    from gis_city_county_spark.operators.dedup import containment_pairs

    inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    wrapper = (
        "header line with site navigation and menu junk " + inner +
        " footer line with copyright and contact details and more junk"
    )
    other = "completely different content about volcanic rock formations basalt"
    df = spark.createDataFrame(
        [(1, inner), (2, wrapper), (3, other)], "doc_id long, text string"
    )
    out = {(r["a_id"], r["b_id"]): r for r in
           containment_pairs(df, "doc_id", "text").collect()}
    assert (1, 2) in out
    assert out[(1, 2)]["containment_ppm"] == 1_000_000
    assert all(3 not in pair for pair in out)


def test_repeated_chunks_planted_boilerplate(spark):
    """Docs sharing an 8+-token boilerplate block report repeated
    coverage; a fully unique doc reports zero."""
    from gis_city_county_spark.operators.corpus import repeated_chunk_report

    boiler = "this standard disclaimer text is appended to every single page"
    rows = [
        (1, boiler + " unique first tail content here one two three"),
        (2, boiler + " entirely different continuation text four five six"),
        (3, "totally unique document about migratory birds crossing the delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           repeated_chunk_report(df, "doc_id", "text").collect()}
    assert got[1]["n_repeated"] >= 1 and got[2]["n_repeated"] >= 1
    assert got[3]["n_repeated"] == 0 and got[3]["repeated_ppm"] == 0


def test_char_gini_orders_repetition_below_diverse_text(spark):
    from gis_city_county_spark.operators.textstats import char_gini

    df = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaaaaaa"), (2, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["gini"] for r in char_gini(df, "doc_id", "text").collect()}
    assert got[1] == 0.0  # single character -> zero impurity
    assert got[2] > 0.5


def test_bigram_lm_scores_fluent_above_unseen(spark):
    """A doc made of corpus-frequent bigrams must out-score a doc of
    bigrams that appear only once (smoothed floor)."""
    from gis_city_county_spark.operators.corpus import bigram_lm_score

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(10)]
    rows.append((100, "zx qv jk wp mn bt"))  # singleton bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_ppm"] for r in
           bigram_lm_score(df, "doc_id", "text").collect()}
    assert got[0] > got[100]


def test_resource_allocation_matches_bruteforce(spark):
    from gis_city_county_spark.operators.graph import resource_allocation

    rng = random.Random(13)
    edges = {(rng.randrange(8), 100 + rng.randrange(12)) for _ in range(60)}
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {(r["sa"], r["sb"]): (r["n_common"], r["ra_scaled"])
           for r in resource_allocation(df).collect()}

    from collections import defaultdict
    deg = defaultdict(int)
    nbrs = defaultdict(set)
    for s, z in edges:
        deg[z] += 1
        nbrs[s].add(z)
    want = {}
    ss = sorted(nbrs)
    for i, a in enumerate(ss):
        for b in ss[i + 1:]:
            shared = nbrs[a] & nbrs[b]
            if shared:
                want[(a, b)] = (
                    len(shared),
                    sum(1_000_000_000_000 // deg[z] for z in shared),
                )
    assert got == want
