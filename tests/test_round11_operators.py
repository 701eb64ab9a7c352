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
