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
