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


def _py_kcore(edges: set[tuple[int, int]], k: int, rounds: int) -> dict[int, int]:
    """Reference peel: drop nodes with degree < k, round-synchronous,
    at most `rounds` rounds (mirrors the bounded distributed peel)."""
    cur = set(edges)
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for s, _d in cur:
            deg[s] = deg.get(s, 0) + 1
        low = {n for n, d in deg.items() if d < k}
        if not low:
            break
        cur = {(s, d) for s, d in cur if s not in low and d not in low}
    out: dict[int, int] = {}
    for s, _d in cur:
        out[s] = out.get(s, 0) + 1
    return out


def test_kcore_matches_reference_peel_on_random_graphs(spark):
    """Property: the distributed peel equals the round-synchronous
    Python reference on seeded random symmetric graphs, for several
    (n, p, k) shapes including ones that peel to empty and ones that
    early-exit."""
    import random

    from gis_city_county_spark.operators.graph import kcore

    for seed, n, p, k in [(1, 20, 0.2, 3), (2, 30, 0.15, 4),
                          (3, 25, 0.5, 9), (4, 15, 0.1, 5)]:
        rng = random.Random(seed)
        und = {(a, b) for a in range(n) for b in range(a + 1, n)
               if rng.random() < p}
        edges = {(a, b) for a, b in und} | {(b, a) for a, b in und}
        if not edges:
            continue
        want = _py_kcore(edges, k, rounds=6)
        df = spark.createDataFrame(sorted(edges), ["src", "dst"])
        got = {r["node"]: r["deg"] for r in kcore(df, k, rounds=6).collect()}
        assert got == want, f"seed={seed} n={n} p={p} k={k}"


def test_kcore_hand_computed(spark):
    # triangle {1,2,3} plus pendant 4-1: 2-core = the triangle.
    und = [(1, 2), (2, 3), (1, 3), (1, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    from gis_city_county_spark.operators.graph import kcore

    out = {r["node"]: r["deg"] for r in kcore(edges, k=2, rounds=6).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_converged_flag_on_deep_chain(spark):
    """A path graph peels one node per end per round, so full 2-core
    peeling of a 12-node chain needs ~6 rounds: an under-sized bound
    must say converged=False (the result is a supergraph of the true
    empty core), a sufficient bound converged=True."""
    from gis_city_county_spark.operators.graph import kcore

    und = [(i, i + 1) for i in range(11)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    shallow = kcore(edges, k=2, rounds=2).collect()
    assert shallow, "2 rounds cannot finish peeling a 12-chain"
    assert all(r["converged"] is False for r in shallow)
    deep = kcore(edges, k=2, rounds=12).collect()
    assert deep == []  # true 2-core of a path is empty
    # triangle core: early exit, flag True
    tri = [(1, 2), (2, 3), (1, 3)]
    tri_df = spark.createDataFrame(
        tri + [(b, a) for a, b in tri], ["src", "dst"]
    )
    out = kcore(tri_df, k=2, rounds=6).collect()
    assert {r["node"] for r in out} == {1, 2, 3}
    assert all(r["converged"] is True for r in out)


def test_label_propagation_hand_computed(spark):
    # path 1-2-3 plus isolated pair 10-11 (all edges symmetric).
    und = [(1, 2), (2, 3), (10, 11)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    from gis_city_county_spark.operators.graph import label_propagation

    # round 1: 1<-{2}=2, 2<-{1,3}->min label 1, 3<-{2}=2; 10<->11 swap
    # to min 10... (10 adopts 11? neighbors of 10 = {11} -> 11; 11 -> 10)
    out1 = {r["node"]: r["label"]
            for r in label_propagation(edges, rounds=1).collect()}
    assert out1 == {1: 2, 2: 1, 3: 2, 10: 11, 11: 10}
    # round 2: 1<-{2:1}=1, 2<-{1:2,3:2}=2, 3<-{2:1}=1; pair swaps back
    out2 = {r["node"]: r["label"]
            for r in label_propagation(edges, rounds=2).collect()}
    assert out2 == {1: 1, 2: 2, 3: 1, 10: 10, 11: 11}
