"""Unit semantics for operators.graph: integer-scaled PageRank on a
hand-computed 3-node graph (A↔B, B↔C)."""

from __future__ import annotations

from gis_city_county_spark.operators.graph import pagerank


def test_pagerank_hand_computed(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], ["src", "dst"]
    )
    # scale=1000, base = 15*1000//100 = 150
    # r0 = 1000 everywhere; outdeg A=1, B=2, C=1
    # iter1: m(A)=500, m(B)=2000, m(C)=500
    #   → A=150+425=575, B=150+1700=1850, C=575
    # iter2: m(A)=925, m(B)=575+575=1150, m(C)=925
    #   → A=150+78625//100... (85*925)//100=786 → 936
    #     B=150+(85*1150)//100=977 → 1127, C=936
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=2, scale=1000).collect()}
    assert out == {1: 936, 2: 1127, 3: 936}


def test_pagerank_dangling_mass_not_redistributed(spark):
    # B has no out-edges: its mass drains (contract: no redistribution).
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=1, scale=1000).collect()}
    # A receives nothing: 150. B receives all of A's 1000: 150+850.
    assert out == {1: 150, 2: 1000}
