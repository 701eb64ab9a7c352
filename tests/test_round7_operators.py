"""Round-7 tests: property fixtures for the round-6 text operators
(hapax/TTR), the newly registered NDCG@k retrieval metric, and the
IVF index-cache crash-recovery hardening from the round-6 ADVICE."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- hapax


def test_hapax_all_unique_tokens_is_one_million_ppm(spark):
    """A group whose every token is unique: n_hapax == n_types ==
    n_tokens, so hapax_per_type_ppm == ttr_ppm == 1_000_000."""
    from gis_city_county_spark.operators.textstats import hapax_stats

    df = spark.createDataFrame(
        [("u", "alpha beta gamma"), ("u", "delta epsilon")],
        "g string, body string",
    )
    row = hapax_stats(df, "g", "body").collect()[0]
    assert row["n_tokens"] == 5
    assert row["n_types"] == 5
    assert row["n_hapax"] == 5
    assert row["hapax_per_type_ppm"] == 1_000_000
    assert row["ttr_ppm"] == 1_000_000


def test_hapax_single_repeated_token_is_zero(spark):
    """A group that repeats one token has zero hapax legomena."""
    from gis_city_county_spark.operators.textstats import hapax_stats

    df = spark.createDataFrame(
        [("b", "spam spam spam"), ("b", "spam spam")],
        "g string, body string",
    )
    row = hapax_stats(df, "g", "body").collect()[0]
    assert row["n_tokens"] == 5
    assert row["n_types"] == 1
    assert row["n_hapax"] == 0
    assert row["hapax_per_type_ppm"] == 0
    assert row["ttr_ppm"] == 200_000


# ------------------------------------------------------------ TTR curve


def test_ttr_curve_boilerplate_flat_vs_distinct(spark):
    """Boilerplate (one token repeated) keeps the distinct-type count
    FLAT across the 16/64/256 prefixes while the ratio collapses;
    all-distinct natural text holds the ratio at exactly 1M ppm."""
    from gis_city_county_spark.operators.textstats import ttr_curve

    boiler = " ".join(["na"] * 300)
    natural = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame(
        [("boiler", boiler), ("nat", natural)], "g string, body string"
    )
    rows = {r["g"]: r for r in ttr_curve(df, "g", "body").collect()}

    b = rows["boiler"]
    assert b["types_at16"] == b["types_at64"] == b["types_at256"] == 1
    assert (b["tokens_at16"], b["tokens_at64"], b["tokens_at256"]) == (
        16, 64, 256,
    )
    # ratio collapses as the prefix grows: 1/16 > 1/64 > 1/256
    assert b["ttr_at16_ppm"] > b["ttr_at64_ppm"] > b["ttr_at256_ppm"]

    n = rows["nat"]
    for k in (16, 64, 256):
        assert n[f"types_at{k}"] == n[f"tokens_at{k}"] == k
        assert n[f"ttr_at{k}_ppm"] == 1_000_000


# --------------------------------------------------------------- NDCG@k


def _ndcg_fixture_rows():
    # query A: graded relevance with a SCORE TIE between d2 (rel 3)
    # and d3 (rel 0) — id ASC must break it identically on both
    # engines; model order (d1,d2,d3,d4) vs ideal (d2,d4,d1,d3).
    a = [
        ("A", 9.0, "d1", 1),
        ("A", 7.0, "d2", 3),
        ("A", 7.0, "d3", 0),
        ("A", 5.0, "d4", 2),
    ]
    # query B: all-zero relevance -> idcg 0 -> ndcg NULL.
    b = [("B", 4.0, "e1", 0), ("B", 3.0, "e2", 0)]
    # query C: perfect ordering -> ndcg exactly 1.0.
    c = [("C", 2.0, "f1", 2), ("C", 1.0, "f2", 1)]
    # query D: one NULL relevance row (dropped) + one graded row.
    d = [("D", 8.0, "g1", None), ("D", 6.0, "g2", 1)]
    return a + b + c + d


def test_ndcg_graded_fixture_with_ties(spark):
    from gis_city_county_spark.operators.mlprep import ndcg_at_k

    df = spark.createDataFrame(
        _ndcg_fixture_rows(), "q string, s double, id string, rel int"
    )
    rows = {r["q"]: r for r in ndcg_at_k(df, "q", "s", "rel", "id", k=3).collect()}

    import math

    disc = [1.0 / math.log2(r + 1) for r in range(1, 4)]
    # model top-3 of A: d1(1), d2(3), d3(0); ideal: d2(3), d4(2), d1(1)
    dcg = 1 * disc[0] + 3 * disc[1] + 0 * disc[2]
    idcg = 3 * disc[0] + 2 * disc[1] + 1 * disc[2]
    assert rows["A"]["n_items"] == 4
    assert rows["A"]["dcg"] == pytest.approx(dcg, abs=0)
    assert rows["A"]["idcg"] == pytest.approx(idcg, abs=0)
    assert rows["A"]["ndcg"] == pytest.approx(dcg / idcg, abs=0)

    assert rows["B"]["idcg"] == 0.0 and rows["B"]["ndcg"] is None
    assert rows["C"]["ndcg"] == 1.0
    assert rows["D"]["n_items"] == 1  # NULL-relevance row dropped


def test_ndcg_matches_duckdb_twin_bit_exact(spark):
    from gis_city_county_spark.operators.mlprep import ndcg_at_k, ndcg_at_k_sql

    df = spark.createDataFrame(
        _ndcg_fixture_rows(), "q string, s double, id string, rel int"
    )
    eng = {
        r["q"]: (r["n_items"], r["dcg"], r["idcg"], r["ndcg"])
        for r in ndcg_at_k(df, "q", "s", "rel", "id", k=3).collect()
    }
    duck = duckdb.connect()
    vals = ", ".join(
        f"('{q}', {s}, '{i}', {('NULL' if r is None else r)})"
        for q, s, i, r in _ndcg_fixture_rows()
    )
    src = f"SELECT * FROM (VALUES {vals}) t(q, s, id, rel)"
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in duck.execute(
            ndcg_at_k_sql(f"({src})", "q", "s", "rel", "id", k=3)
        ).fetchall()
    }
    assert eng == got


# -------------------------------------------------- IVF cache hardening


def test_ivf_cache_rebuilds_half_built_dir(spark, sf_dir, monkeypatch):
    """A cache dir WITHOUT the centroids commit marker (crashed
    in-place build from the old scheme) must be replaced by a fresh
    build, and stale *.build-* scratch dirs must be swept."""
    import os
    import tempfile
    import time
    from pathlib import Path

    from gis_city_county_spark.suite import similarity_q

    monkeypatch.setattr(similarity_q, "_IVF_INDEX_DIRS", {})
    with tempfile.TemporaryDirectory() as tmp:
        monkeypatch.setattr(tempfile, "gettempdir", lambda: tmp)
        cache = Path(tmp) / "sgraft_ivf_cache"
        cache.mkdir()
        # half-built survivor for EVERY tag: pre-create on first call
        # is impossible (tag depends on mtime), so fake one by calling
        # once, gutting the marker, clearing memo, and calling again.
        p1 = Path(similarity_q._ivf_index_dir(spark, sf_dir))
        assert (p1 / "centroids" / "_SUCCESS").exists()
        (p1 / "centroids" / "_SUCCESS").unlink()
        junk = p1 / "centroids" / "half.parquet.tmp"
        junk.write_bytes(b"junk")
        # plant a stale scratch dir (mtime pushed back 2 h)
        orphan = cache / f"{p1.name}.build-deadbeef"
        orphan.mkdir()
        old = time.time() - 7200
        os.utime(orphan, (old, old))

        monkeypatch.setattr(similarity_q, "_IVF_INDEX_DIRS", {})
        p2 = Path(similarity_q._ivf_index_dir(spark, sf_dir))
        assert p2 == p1
        assert (p2 / "centroids" / "_SUCCESS").exists()
        assert not junk.exists()  # the gutted dir was replaced
        assert not orphan.exists()  # stale scratch swept


# ------------------------------------------------------- Cohen's kappa


def test_cohens_kappa_perfect_and_degenerate(spark):
    from gis_city_county_spark.operators.mlprep import cohens_kappa

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x")], "a string, b string"
    )
    r = cohens_kappa(perfect, "a", "b").collect()[0]
    assert r["n_rows"] == 3 and r["n_agree"] == 3
    assert r["kappa"] == 1.0

    # single shared class: pe == N² -> denominator 0 -> NULL
    degen = spark.createDataFrame(
        [("x", "x"), ("x", "x")], "a string, b string"
    )
    r = cohens_kappa(degen, "a", "b").collect()[0]
    assert r["kappa"] is None

    # NULL labels are dropped
    with_null = spark.createDataFrame(
        [("x", "x"), (None, "y"), ("y", None)], "a string, b string"
    )
    r = cohens_kappa(with_null, "a", "b").collect()[0]
    assert r["n_rows"] == 1


def test_cohens_kappa_known_value_and_duckdb_parity(spark):
    """Classic 2×2 fixture: a=yes/no vs b=yes/no with known kappa
    (N=50, agree=35, marginals 25/25 & 30/20 -> pe_num=1250,
    kappa = (50·35−1250)/(2500−1250) = 0.4)."""
    import duckdb

    from gis_city_county_spark.operators.mlprep import (
        cohens_kappa,
        cohens_kappa_sql,
    )

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert (r["n_rows"], r["n_agree"], r["pe_num"]) == (50, 35, 1250)
    assert r["kappa"] == pytest.approx(0.4, abs=0)

    duck = duckdb.connect()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in rows)
    got = duck.execute(
        cohens_kappa_sql(
            f"(SELECT * FROM (VALUES {vals}) t(a, b))", "a", "b"
        )
    ).fetchall()[0]
    eng = cohens_kappa(df, "a", "b").collect()[0]
    assert (
        got[0], got[1], got[2], got[3], got[4], got[5]
    ) == (
        eng["n_rows"], eng["n_agree"], eng["n_classes_a"],
        eng["n_classes_b"], eng["pe_num"], eng["kappa"],
    )


# ---------------------------------------------------- Simpson diversity


def test_simpson_diversity_uniform_and_single(spark):
    from gis_city_county_spark.operators.profile import simpson_diversity

    uniform = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "c string"
    )
    r = simpson_diversity(uniform, "c").collect()[0]
    assert r["n_rows"] == 4 and r["n_categories"] == 4
    assert r["concentration_ppm"] == 0
    assert r["diversity_ppm"] == 1_000_000
    assert r["effective_categories_milli"] == 4000

    single = spark.createDataFrame([("a",), ("a",), ("a",)], "c string")
    r = simpson_diversity(single, "c").collect()[0]
    assert r["concentration_ppm"] == 1_000_000
    assert r["diversity_ppm"] == 0
    assert r["effective_categories_milli"] == 1000

    one_row = spark.createDataFrame([("a",)], "c string")
    r = simpson_diversity(one_row, "c").collect()[0]
    assert r["concentration_ppm"] is None and r["diversity_ppm"] is None
    assert r["effective_categories_milli"] == 1000


# ----------------------------------------------------- charclass profile


def test_charclass_profile_counts(spark):
    from gis_city_county_spark.operators.textstats import charclass_profile

    df = spark.createDataFrame(
        [("en", "ab1 !"), ("zh", "你好"), ("empty", "")],
        "g string, body string",
    )
    rows = {r["g"]: r for r in charclass_profile(df, "g", "body").collect()}
    en = rows["en"]  # 5 chars: 2 letters, 1 digit, 1 space, 1 other
    assert en["total_chars"] == 5
    assert en["letter_ppm"] == 400_000
    assert en["digit_ppm"] == 200_000
    assert en["space_ppm"] == 200_000
    assert en["cjk_ppm"] == 0
    assert en["other_ppm"] == 200_000
    zh = rows["zh"]
    assert zh["cjk_ppm"] == 1_000_000 and zh["letter_ppm"] == 0
    emp = rows["empty"]
    assert emp["total_chars"] == 0 and emp["letter_ppm"] is None


# ---------------------------------------------------- quality rule audit


def test_quality_rule_audit_each_rule_fires(spark):
    from gis_city_county_spark.operators.corpus import quality_rule_audit

    long_doc = " ".join(f"w{i}" for i in range(1001))
    # 25 words incl. stopwords, mixed casing, clean
    clean_doc = ("the quick brown fox jumps over the lazy dog and then "
                 "the other animals watch it run far away with a smile "
                 "on its face")
    rep_doc = " ".join(["spam"] * 30)
    sym_doc = "!!!! @@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) " * 3
    dig_doc = "12345 67890 11111 22222 33333 44444 55555 66666 " * 3
    rows = [
        ("s", "tiny doc"),                 # short (2 words)
        ("s", long_doc),                   # long
        ("s", clean_doc),                  # clean (stopword-rich)
        ("s", rep_doc),                    # repetitive + low stopword
        ("s", sym_doc),                    # symbol heavy
        ("s", dig_doc),                    # digit heavy
    ]
    df = spark.createDataFrame(rows, "src string, body string")
    r = quality_rule_audit(df, "src", "body").collect()[0]
    assert r["n_docs"] == 6
    assert r["n_short"] == 1
    assert r["n_long"] == 1
    # rep_doc, plus the symbol/digit docs (each repeats its 10-token
    # line three times, so they trip the distinct-ratio rule too)
    assert r["n_repetitive"] == 3
    assert r["n_symbol_heavy"] >= 1
    assert r["n_digit_heavy"] >= 1
    assert r["n_clean"] == 1
    assert r["clean_ppm"] == 166_666


# ------------------------------------------------------- vocab overlap


def test_vocab_overlap_pairs_exact_jaccard(spark):
    from gis_city_county_spark.operators.corpus import vocab_overlap_pairs

    df = spark.createDataFrame(
        [
            ("a", "cat dog fish"),
            ("b", "cat dog bird"),
            ("c", "cat dog fish"),
            (None, "ignored tokens"),
        ],
        "src string, body string",
    )
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in vocab_overlap_pairs(df, "src", "body").collect()
    }
    ab = rows[("a", "b")]
    assert (ab["n_types_a"], ab["n_types_b"], ab["n_common"]) == (3, 3, 2)
    assert ab["jaccard_ppm"] == 500_000  # 2 / 4
    ac = rows[("a", "c")]
    assert ac["jaccard_ppm"] == 1_000_000  # identical vocab
    assert ("a", None) not in rows and (None, "a") not in rows
