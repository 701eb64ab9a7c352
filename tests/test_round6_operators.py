"""Round-6 regression tests: degenerate-input guards added from the
round-5 ADVICE (zero divisors, boundary bins, NULL groups/values) plus
the round-6 operator fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_t_closeness_single_sensitive_value_nulls(spark):
    """m = 1 distinct sensitive value: EMD denominator (m-1) is zero —
    t_ppm and violates_t must come back NULL, not error/diverge."""
    from gis_city_county_spark.operators.privacy import t_closeness

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x")], "q string, s string"
    )
    rows = t_closeness(df, ["q"], "s").collect()
    assert len(rows) == 2
    for r in rows:
        assert r["t_ppm"] is None
        assert r["violates_t"] is None


def test_t_closeness_sql_single_value_matches(spark):
    import duckdb

    from gis_city_county_spark.operators.privacy import (
        t_closeness,
        t_closeness_sql,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x")], "q string, s string"
    )
    duck = duckdb.connect()
    duck.execute(
        "CREATE OR REPLACE VIEW one_val AS "
        "SELECT * FROM (VALUES ('a','x'),('a','x'),('b','x')) t(q, s)"
    )
    got = {
        tuple(r)
        for r in duck.execute(
            t_closeness_sql("SELECT q, s FROM one_val", ["q"], "s")
        ).fetchall()
    }
    eng = {tuple(r) for r in t_closeness(df, ["q"], "s").collect()}
    assert eng == got


def test_tokenizer_fertility_zero_words_null(spark):
    """A group whose docs have zero whitespace words reports NULL
    fertility on the engine (and the DuckDB twin nulls identically)."""
    from gis_city_county_spark.operators.textstats import tokenizer_fertility

    df = spark.createDataFrame(
        [("empty", ""), ("empty", "   "), ("ok", "two words")],
        "g string, body string",
    )
    rows = {r["g"]: r for r in tokenizer_fertility(df, "g", "body").collect()}
    assert rows["empty"]["n_words"] == 0
    assert rows["empty"]["fertility_ppm"] is None
    assert rows["empty"]["fertility"] is None
    assert rows["ok"]["fertility_ppm"] is not None


def test_brier_bin_clamp_boundary_and_negative(spark):
    """pred_milli = 1000 (probability exactly 1.0) must land in the top
    bin, not an out-of-range 11th bin; out-of-contract negatives clamp
    to bin 0 on both engines instead of diverging on div-vs-floor."""
    from gis_city_county_spark.operators.mlprep import brier_decomposition

    df = spark.createDataFrame(
        [(1000, 1), (1000, 1), (0, 0), (-3, 0), (500, 1)],
        "p long, y long",
    )
    row = brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    assert row["n"] == 5
    # All rows accounted for: the 1000s and the -3 were not dropped
    # into phantom bins (the decomposition identity only holds if the
    # bin partition covers every row exactly once).
    assert row["pos"] == 3
    assert row["brier"] == pytest.approx(
        row["reliability"] - row["resolution"] + row["uncertainty"]
    )


def test_winsorize_ignores_null_values(spark):
    """NULL value rows are excluded from n, the cut ranks, and the
    sum — the stats are over the non-null values only."""
    from gis_city_county_spark.operators.mlprep import winsorize_stats

    vals = [float(v) for v in range(1, 21)]
    rows = [("g", v, i) for i, v in enumerate(vals)]
    rows += [("g", None, 100), ("g", None, 101)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    with_nulls = winsorize_stats(df, "g", "v", "id").collect()[0]
    clean = winsorize_stats(
        spark.createDataFrame(
            [r for r in rows if r[1] is not None], "g string, v double, id long"
        ),
        "g", "v", "id",
    ).collect()[0]
    assert with_nulls == clean
    assert with_nulls["n"] == 20


def test_incremental_dedup_null_group_counted(spark):
    """Rows with a NULL group form a real group: the null-safe join
    must report their fresh/kept counts instead of calling every
    NULL-group row a base-dup with n_ingested = 0."""
    from gis_city_county_spark.operators.dedup import incremental_dedup_report

    base = spark.createDataFrame([(1, "seen before")], "id long, body string")
    incoming = spark.createDataFrame(
        [
            (10, "brand new", None),
            (11, "brand new", None),  # in-batch dup of 10
            (12, "seen before", None),  # dup vs base
            (13, "other new", "g1"),
        ],
        "id long, body string, src string",
    )
    rows = {
        r["src"]: r
        for r in incremental_dedup_report(
            base, incoming, "id", "body", "src"
        ).collect()
    }
    null_grp = rows[None]
    assert null_grp["n_incoming"] == 3
    assert null_grp["n_dup_vs_base"] == 1
    assert null_grp["n_dup_in_batch"] == 1
    assert null_grp["n_ingested"] == 1
    assert rows["g1"]["n_ingested"] == 1


def test_containment_blocking_guarantee_and_documented_miss(spark):
    """Pins the rare-shingle blocking guarantee (operators/dedup.py):
    a contained doc owning >= 1 rare shingle MUST be found; a
    contained doc made ENTIRELY of ubiquitous shingles is the
    documented miss — and raising max_shingle_df recovers it."""
    from gis_city_county_spark.operators.dedup import containment_pairs

    host_words = [f"host{i}" for i in range(30)]
    long_doc = " ".join(host_words)
    short_doc = " ".join(host_words[10:16])  # 6-token excerpt: contained
    boiler = "terms of service apply here"  # 5 ubiquitous tokens
    rows = [(1, long_doc), (2, short_doc)]
    # 12 hosts all carrying the boilerplate -> its shingles have
    # df >= 13 > default cap 8
    for i in range(12):
        rows.append((100 + i, f"unique{i}a unique{i}b {boiler} unique{i}c"))
    rows.append((50, boiler))  # contained doc with ONLY ubiquitous shingles
    df = spark.createDataFrame(rows, "doc_id long, body string")

    found = {
        (r["a_id"], r["b_id"])
        for r in containment_pairs(df, "doc_id", "body", k=3).collect()
    }
    # Guarantee: the rare-shingled excerpt is found with containment 1.
    assert (1, 2) in found
    # Documented miss: doc 50 shares only df>8 shingles -> no pair.
    assert not any(50 in p for p in found)

    # Raising the cap recovers the all-ubiquitous contained doc.
    relaxed = {
        (r["a_id"], r["b_id"])
        for r in containment_pairs(
            df, "doc_id", "body", k=3, max_shingle_df=50
        ).collect()
    }
    assert any(50 in p for p in relaxed)


def test_bitext_lsh_agrees_with_bruteforce_on_planted_pair(spark):
    """A near-identical cross-lingual pair shares every LSH band, so
    the bucketed miner must align it exactly like the brute-force
    miner; and on any probe both variants answer, the LSH cos1 can
    never exceed the brute-force cos1 (its candidate set is a
    subset)."""
    import random

    from gis_city_county_spark.operators.similarity import (
        bitext_mining_top1,
        bitext_mining_top1_lsh,
    )

    rng = random.Random(13)
    rows = []
    meta = []
    for i in range(40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
        meta.append((i, "en" if i % 2 == 0 else "de"))
    planted = [rng.uniform(-1, 1) for _ in range(64)]
    rows.append((100, planted))          # en target
    meta.append((100, "en"))
    rows.append((101, [x + 1e-6 for x in planted]))  # de probe, near-identical
    meta.append((101, "de"))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    docs = spark.createDataFrame(meta, "doc_id long, lang string")

    lsh = {
        r["probe_id"]: r
        for r in bitext_mining_top1_lsh(
            emb, docs, "vec_id", "embedding", "doc_id", "lang", "de", "en"
        ).collect()
    }
    brute = {
        r["probe_id"]: r
        for r in bitext_mining_top1(
            emb, docs, "vec_id", "embedding", "doc_id", "lang", "de", "en",
            probe_mod=1,
        ).collect()
    }
    assert lsh[101]["best_id"] == 100
    assert brute[101]["best_id"] == 100
    assert lsh[101]["cos1"] > 0.999
    for pid, r in lsh.items():
        if pid in brute:
            assert r["cos1"] <= brute[pid]["cos1"] + 1e-12
            if r["best_id"] == brute[pid]["best_id"]:
                assert r["cos1"] == brute[pid]["cos1"]


def test_pq_rerank_probe_batch_cap(spark):
    """max_probe_batch bounds stage-1 to the LOWEST probe ids,
    deterministically; results for the surviving probes are identical
    to the uncapped run."""
    import random

    from gis_city_county_spark.operators.similarity import pq_rerank_topk

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pred = F.col("vec_id") % 10 == 0  # 12 probes: 0,10,...,110
    capped = pq_rerank_topk(
        emb, "vec_id", "embedding", pred, k=3, max_probe_batch=5
    ).collect()
    full = pq_rerank_topk(
        emb, "vec_id", "embedding", pred, k=3, max_probe_batch=None
    ).collect()
    capped_probes = {r["probe_id"] for r in capped}
    assert capped_probes == {0, 10, 20, 30, 40}  # lowest 5 probe ids
    full_map = {(r["probe_id"], r["rank"]): r for r in full}
    for r in capped:
        assert full_map[(r["probe_id"], r["rank"])]["neighbor_id"] == r["neighbor_id"]
