"""Focused equivalence tests for the round-12 optimization rewrites.

Each optimization changed an operator's INTERNALS while promising
bit-identical results; these tests pin the promise by running both
shapes (or the array/exploded twins) on the same input and comparing
row sets exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------ bradley_terry paths


def test_bradley_terry_local_path_matches_relational_loop(spark):
    """The driver-side MM fast path (measured-small cell relation) and
    the relational per-round loop must produce identical rows — same
    integer floor-division arithmetic, same ordering."""
    from gis_city_county_spark.operators.mlprep import bradley_terry

    contests = spark.createDataFrame(
        [
            ("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"),
            ("c", "b"), ("c", "b"), ("b", "c"), ("a", "d"),
            ("d", "c"), ("a", "c"), ("b", "d"), ("d", "b"),
        ],
        "winner string, loser string",
    )
    fast = bradley_terry(contests, "winner", "loser", rounds=6)
    slow = bradley_terry(
        contests, "winner", "loser", rounds=6, local_max_cells=0
    )
    assert fast.columns == slow.columns
    assert _rows(fast) == _rows(slow)


def test_bradley_terry_local_path_zero_win_item(spark):
    """An item with zero wins converges to strength 0 on BOTH paths
    (the documented BT connectivity caveat)."""
    from gis_city_county_spark.operators.mlprep import bradley_terry

    contests = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("a", "c")],
        "winner string, loser string",
    )
    fast = {r["item"]: r for r in bradley_terry(
        contests, "winner", "loser", rounds=5).collect()}
    slow = {r["item"]: r for r in bradley_terry(
        contests, "winner", "loser", rounds=5, local_max_cells=0).collect()}
    assert fast.keys() == slow.keys()
    for k in fast:
        assert tuple(fast[k]) == tuple(slow[k])
    assert fast["c"]["strength"] == 0  # never wins


# ------------------------------------- label_propagation cadence


def test_label_propagation_unrolled_matches_per_round_checkpoint(spark):
    """Segment unrolling (checkpoint_every=4) is a plan-shape change
    only: labels after R rounds must equal the per-round-checkpoint
    (checkpoint_every=1) labeling exactly."""
    from gis_city_county_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 4),
         (6, 1), (1, 6), (3, 6), (6, 3), (7, 7)],
        "src long, dst long",
    )
    unrolled = label_propagation(edges, rounds=4, checkpoint_every=4)
    stepped = label_propagation(edges, rounds=4, checkpoint_every=1)
    assert _rows(unrolled) == _rows(stepped)


# -------------------------------- shingle array/exploded twins


def test_shingle_array_df_explode_equals_shingle_df(spark):
    """shingle_df is now the explode of shingle_array_df; the pair
    must stay row-identical (same distinct shingle sets per doc)."""
    from gis_city_county_spark.operators.dedup import (
        shingle_array_df,
        shingle_df,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox"),
            (3, "tiny"),
            (4, "a a a a a a"),
        ],
        "doc_id long, text string",
    )
    exploded = _rows(
        shingle_array_df(docs, "doc_id", "text", 3).select(
            "doc_id", F.explode("__shs").alias("shingle")
        )
    )
    direct = _rows(shingle_df(docs, "doc_id", "text", 3, unique_id_rows=True))
    assert exploded == direct


def test_containment_pairs_array_verify_exact(spark):
    """Row-local array_intersect verification must count the exact
    distinct-shingle intersection (a contained doc scores ppm by the
    SMALLER side)."""
    from gis_city_county_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (3, "totally different words here entirely unrelated"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["a_id"], r["b_id"]): r
        for r in containment_pairs(
            docs, "doc_id", "text", k=3, threshold_ppm=500_000,
            max_shingle_df=8,
        ).collect()
    }
    assert (1, 2) in out
    row = out[(1, 2)]
    # doc1 has 4 distinct 3-shingles, all contained in doc2's 7.
    assert row["n_a"] == 4 and row["n_b"] == 7
    assert row["n_inter"] == 4
    assert row["containment_ppm"] == 1_000_000
    assert (1, 3) not in out and (2, 3) not in out
