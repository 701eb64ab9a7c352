"""Graph analytics over relational edge lists.

Greenfield (SURVEY.md §7 — the reference has no graph surface;
near-dup clustering in ``operators.dedup`` already needs transitive
closure, and ranking entities in a supplier/customer or link graph is
the next standard ask of the same edge data).

``pagerank`` is the deterministic integer-scaled variant: ranks are
BIGINTs (initial mass ``scale`` per node) and each update is

    rank'(v) = (15·scale) div 100 + (85 · Σ_{u→v} rank(u) div outdeg(u)) div 100

— all integer arithmetic, so the result is exact, order-independent,
and bit-identical on any engine (float PageRank sums diverge in the
last ulps under parallel reduction). Mass lost to integer truncation
and dangling nodes is *not* redistributed; that loss is part of the
operator's contract, identically on both sides.

Scale notes (100 TB): each iteration is one shuffle join
(edges ⋈ ranks, both hash-keyed on the source node) plus one
map-side-combinable SUM keyed on the destination — the standard
Pregel-as-relational shape. ``localCheckpoint`` truncates lineage per
round (cluster deployments would ``checkpoint()`` to durable storage
instead). Out-degrees are computed once, attached to the edge list,
and reused across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gis_city_county_spark.operators.scale import (
    checkpoint_eager,
    checkpoint_lazy,
)

DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Integer-scaled PageRank over a directed edge list.

    Nodes are the distinct edge endpoints. Returns (node, rank) with
    ``rank`` in units of ``1/scale``.

    Each rank appears exactly once in the next iteration's plan, so a
    small iteration count composes into ONE linear query (AQE plans
    the whole chain; no per-round job barrier); lineage is truncated
    only every ``checkpoint_every`` rounds to keep long runs bounded.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(outdeg, "src").transform(checkpoint_lazy)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(checkpoint_lazy)
    )
    base = (DAMP_DEN - DAMP_NUM) * scale // DAMP_DEN
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for i in range(iters):
        msgs = (
            ed.join(ranks, ed.src == ranks.node)
            .select(F.col("dst"), F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(msgs, nodes.node == msgs.dst, "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({DAMP_NUM} * coalesce(m, 0L)) div {DAMP_DEN}")
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(checkpoint_lazy)
    return ranks


def pagerank_sql(
    edges_sql: str,
    iters: int = 5,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin: the fixed iteration count is unrolled into chained
    CTEs (aggregation over the working table inside a recursive CTE is
    not portable)."""
    base = (DAMP_DEN - DAMP_NUM) * scale // DAMP_DEN
    parts = [
        f"WITH edges AS ({edges_sql})",
        "outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, o.deg FROM edges e JOIN outdeg o USING (src))",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
  SELECT n.node,
         CAST({base} + ({DAMP_NUM} * COALESCE(s.m, 0)) // {DAMP_DEN} AS BIGINT)
           AS rank
  FROM nodes n LEFT JOIN (
    SELECT dst, SUM(rank // deg) AS m
    FROM ed JOIN r{i} ON ed.src = r{i}.node GROUP BY dst
  ) s ON n.node = s.dst)"""
        )
    return ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Single-source shortest hop counts by iterative frontier
    expansion — (node, hops) for every node within ``max_hops`` of
    ``source``.

    The Pregel-as-relational BFS, aggregate-only form: each round
    joins the labeled set against the edge list (one hash join keyed
    on the node) and min-aggregates hop counts; rounds chain into one
    adaptive plan (no per-round driver job).  Hop counts are exact
    integers: bit-identical to the recursive-CTE oracle on any
    engine.
    """
    # Materialize the edge list once — every round's join would
    # otherwise re-derive it from its full upstream lineage (scans +
    # joins).  Lazy: the single unrolled action below materializes it
    # on first use with no extra driver barrier.
    edges = edges.transform(checkpoint_lazy)
    labels = edges.sparkSession.createDataFrame(
        [(source, 0)], "node long, hops long"
    )
    # Aggregate-only rounds unrolled into ONE adaptive plan (r13; the
    # LPA segment-unroll finding): labels_{r+1} = min hops over
    # labels_r ∪ (labels_r ⋈ edges → dst, hops+1) — identical final
    # frame to the old frontier/anti-join/isEmpty loop (min over all
    # ≤ max_hops walks IS the capped shortest distance), but the
    # per-round eager checkpoint + isEmpty driver jobs (~0.6s/round
    # measured at sf0.1 vs ~0.04s/round of data work) are gone; the
    # doubled per-round `labels` reference dedupes via AQE
    # exchange/stage reuse because the subtrees are canonically
    # identical.  Lineage is truncated every 4 rounds so deep-hop
    # calls keep bounded plans (same cadence as label_propagation).
    # The trade-off vs the frontier loop: no early exit when the
    # reachable set saturates before max_hops, and every round
    # re-aggregates the full labeled set rather than the frontier —
    # the right trade at shallow max_hops (the operators' use: 3-4
    # hops); a diameter-scale traversal should keep frontier
    # semantics and durable checkpoints instead.
    for hop in range(1, max_hops + 1):
        nxt = labels.join(edges, labels.node == edges[src_col]).select(
            F.col(dst_col).alias("node"),
            (F.col("hops") + F.lit(1).cast("long")).alias("hops"),
        )
        labels = (
            labels.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
        if hop % 4 == 0 and hop < max_hops:
            labels = labels.transform(checkpoint_lazy)
    return labels.orderBy("hops", "node")


def bfs_hops_sql(edges_sql: str, source: int, max_hops: int) -> str:
    """DuckDB oracle twin of :func:`bfs_hops`: the loop unrolled into
    level-synchronous CTEs (frontier k = distinct neighbors of
    frontier k−1 minus all visited) — a naive recursive CTE would
    enumerate every walk, exponential on a dense graph."""
    # AS MATERIALIZED throughout: v{k-1} and n{k} are each referenced
    # twice per level, so DuckDB's default CTE inlining would expand
    # the plan ~2^hops copies of the edge scan (the kcore oracle hit
    # exactly this and spilled tens of GB before materialization).
    ctes = [
        "e AS MATERIALIZED (" + edges_sql + ")",
        f"v0 AS (SELECT CAST({source} AS BIGINT) AS node, CAST(0 AS BIGINT) AS hops)",
        "f0 AS (SELECT node FROM v0)",
    ]
    for k in range(1, max_hops + 1):
        ctes.append(
            f"n{k} AS MATERIALIZED (SELECT c.node, CAST({k} AS BIGINT) AS hops FROM "
            f"(SELECT DISTINCT e.dst AS node FROM f{k-1} JOIN e ON f{k-1}.node = e.src) c "
            f"WHERE c.node NOT IN (SELECT node FROM v{k-1}))"
        )
        ctes.append(
            f"v{k} AS MATERIALIZED "
            f"(SELECT * FROM v{k-1} UNION ALL SELECT * FROM n{k})"
        )
        ctes.append(f"f{k} AS (SELECT node FROM n{k})")
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, hops FROM v{max_hops} ORDER BY hops, node"
    )


# ------------------------------------------------------------- k-core


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core peeling over a symmetric edge list: repeatedly delete
    every node with degree < ``k`` (and its edges) until fixpoint —
    the standard "dense enough to matter" subgraph extraction (spam
    rings, co-purchase cores, collaboration cliques).

    Each round is one degree aggregate (map-side combinable) + two
    anti-joins against the (small, shrinking) low-degree node set;
    ``localCheckpoint`` truncates lineage per round and the loop
    early-exits the moment no node falls below ``k``.  ``rounds``
    bounds the peel for the unrolled-CTE oracle — rounds past the
    fixpoint are no-ops on BOTH engines, so the bound never breaks
    equivalence, it only caps worst-case work (full peeling of a
    pathological chain needs depth rounds).

    Returns surviving ``(node, deg, converged)`` — degree within the
    core, plus a constant ``converged`` flag that is False when the
    bounded peel exhausted ``rounds`` with low-degree nodes still
    present (the result is then a supergraph of the true k-core:
    re-run with a higher bound).  The flag makes an under-sized bound
    visible IN the result instead of silently wrong-by-omission.
    """
    cur = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).transform(checkpoint_eager)
    converged = False
    for _ in range(rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
        # Materialize the (small) low-degree node set once per round:
        # the emptiness probe and both anti-joins read it, and lazily
        # it would re-run the degree aggregate for each.
        low = (
            deg.filter(F.col("__deg") < k)
            .select("src")
            .transform(checkpoint_eager)
        )
        if low.isEmpty():
            converged = True
            break
        cur = (
            cur.join(low, "src", "left_anti")
            .join(low.withColumnRenamed("src", "dst"), "dst", "left_anti")
            .transform(checkpoint_eager)
        )
    if not converged:
        # The loop exhausted its bound with the final round still
        # peeling — one more (cheap, core-sized) degree probe decides
        # whether that last peel happened to land on the fixpoint.
        converged = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") < k)
            .isEmpty()
        )
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(
            F.col("src").alias("node"),
            "deg",
            F.lit(converged).alias("converged"),
        )
    )


def kcore_sql(edges_sql: str, k: int, rounds: int = 6) -> str:
    """DuckDB oracle twin of :func:`kcore`: the peel unrolled into
    ``rounds`` keep-set CTEs (no-ops after the fixpoint, exactly like
    the early-exiting loop).

    Every chained CTE is ``AS MATERIALIZED``: each round references
    the previous edge set three times (the keep-set derivation plus
    both join sides), so DuckDB's default CTE *inlining* would expand
    the plan ~3^rounds — it spilled tens of GB at sf0.1 before
    evaluating anything.  Materialization makes each round linear,
    mirroring the loop's per-round ``localCheckpoint``.

    Mirrors the engine's ``converged`` flag as a scalar subquery over
    the final edge set (no node below ``k`` remains)."""
    ctes = [f"e0 AS MATERIALIZED ({edges_sql})"]
    for r in range(rounds):
        ctes.append(
            f"keep{r} AS MATERIALIZED (SELECT src FROM e{r} GROUP BY src"
            f" HAVING COUNT(*) >= {k})"
        )
        ctes.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r} e"
            f" JOIN keep{r} a ON e.src = a.src"
            f" JOIN keep{r} b ON e.dst = b.src)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT src AS node, COUNT(*) AS deg,"
        + f" (SELECT COUNT(*) FROM (SELECT src FROM e{rounds}"
        + f" GROUP BY src HAVING COUNT(*) < {k})) = 0 AS converged"
        + f" FROM e{rounds} GROUP BY src"
    )


# -------------------------------------------------- label propagation


def label_propagation(
    edges: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own community; each round every node adopts the most
    frequent label among its in-neighbors (ties → smallest label;
    isolated nodes keep their label).  ``rounds`` is part of the
    contract: synchronous LPA can oscillate on bipartite structure, so
    the result is defined as "the labeling after exactly R rounds" —
    deterministic on any engine, which is what the unrolled-CTE oracle
    replays.

    Per round: one edge⋈labels shuffle join, one (node, label) count
    aggregate (map-side combinable), one argmax-by-min-struct per node
    (no window), one left join back for isolated nodes.  Rounds chain
    into one adaptive plan in segments of ``checkpoint_every`` rounds
    (AQE exchange/stage reuse executes each round's canonically
    identical duplicated subtrees once); a lazy ``localCheckpoint``
    truncates lineage at each segment boundary so the doubled
    per-round ``labels`` reference grows the logical plan at most
    2^checkpoint_every within a segment, keeping long runs bounded.
    ``checkpoint_every <= 0`` disables segment checkpointing entirely
    (one fully unrolled plan).

    Returns (node, label) — nodes sharing a label after R rounds are
    one community.
    """
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).transform(checkpoint_eager)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(checkpoint_eager)
    )
    labels = nodes.withColumn("label", F.col("node"))
    for r in range(rounds):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("n"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax (c desc, label asc) as a map-side-combinable min over
        # (-c, label) structs — no per-node window, no sort.
        best = votes.groupBy("n").agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("b")
        ).select(F.col("n").alias("node"), F.col("b.label").alias("new_label"))
        labels = labels.join(best, "node", "left").select(
            "node",
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
        )
        # Segment unrolling (guide §3.3 + measured r12): rounds chain
        # into ONE adaptive plan; `labels` is referenced twice per
        # round, but the duplicated subtrees are canonically identical
        # so exchange/stage reuse executes each round once.  A
        # materialization per round paid one driver barrier + AQE
        # stage scheduling per round (~0.6s/round measured at sf0.1
        # against ~0.04s/round unrolled); lineage is truncated every
        # ``checkpoint_every`` rounds to keep long runs' plans bounded
        # (the doubled reference grows the logical plan 2^k within a
        # segment).
        if (
            checkpoint_every > 0
            and (r + 1) % checkpoint_every == 0
            and r + 1 < rounds
        ):
            labels = labels.transform(checkpoint_lazy)
    return labels


def label_propagation_sql(edges_sql: str, rounds: int = 4) -> str:
    """DuckDB oracle twin: the synchronous rounds unrolled, every
    chained CTE ``AS MATERIALIZED`` (each round references the
    previous labeling twice — inlining would expand ~2^rounds)."""
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)",
    ]
    for r in range(rounds):
        ctes.append(
            f"v{r} AS MATERIALIZED ("
            f"SELECT e.dst AS n, l.label, COUNT(*) AS c "
            f"FROM e JOIN l{r} l ON e.src = l.node GROUP BY e.dst, l.label)"
        )
        ctes.append(
            f"b{r} AS MATERIALIZED ("
            f"SELECT n AS node, label AS new_label FROM ("
            f"SELECT n, label, ROW_NUMBER() OVER ("
            f"PARTITION BY n ORDER BY c DESC, label ASC) AS rk FROM v{r}) t "
            f"WHERE rk = 1)"
        )
        ctes.append(
            f"l{r + 1} AS MATERIALIZED ("
            f"SELECT l.node, COALESCE(b.new_label, l.label) AS label "
            f"FROM l{r} l LEFT JOIN b{r} b ON b.node = l.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, label FROM l{rounds}"
    )


# ------------------------------------------------- resource allocation


def resource_allocation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Resource-Allocation link-prediction index over a bipartite
    src→dst edge list: RA(a,b) = Σ_{z ∈ Γ(a)∩Γ(b)} 1/deg(z) — like
    Adamic-Adar but with a plain reciprocal instead of 1/log(deg), so
    the whole score is EXACT integer arithmetic (per-neighbor term =
    ``scale div deg(z)``, summed as BIGINTs) — no libm, engine-exact.

    Plan: one neighbor-degree aggregate (map-combinable), the standard
    shared-neighbor self-join keyed on the neighbor (same shuffle
    shape as common-neighbors — a pair appears once per shared
    neighbor, so the join output is Σ_z deg(z)², which is why callers
    pre-filter the src side to a candidate sample at corpus scale),
    then one (a,b) sum.

    Returns (sa, sb, n_common, ra_scaled) with sa < sb.
    """
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # edges feeds the degree aggregate + the term join; e feeds both
    # sides of the shared-neighbor self-join — materialize each once
    # instead of replaying the caller's (often join+distinct) lineage
    # per reference (guide §3.3; the r12-before plan of
    # graph_resource_allocation held 16 Exchange / 16 parquet scans)
    edges = _materialize_for_multipass(edges)
    deg = edges.groupBy(dst_col).agg(F.count(F.lit(1)).alias("__deg"))
    e = _materialize_for_multipass(
        edges.join(deg, dst_col).select(
            F.col(src_col).alias("__s"),
            F.col(dst_col).alias("__z"),
            F.expr(f"CAST({scale} AS BIGINT) div __deg").alias("__term"),
        )
    )
    a = e.select(F.col("__s").alias("sa"), "__z", "__term")
    b = e.select(F.col("__s").alias("sb"), "__z")
    return (
        a.join(b, "__z")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("__term").alias("ra_scaled"),
        )
    )


def resource_allocation_sql(
    edges_sql: str, scale: int = 1_000_000_000_000
) -> str:
    """DuckDB twin of :func:`resource_allocation` (edge relation must
    expose ``src``/``dst``)."""
    return f"""
WITH e0 AS ({edges_sql}),
deg AS (SELECT dst, COUNT(*) AS d FROM e0 GROUP BY dst),
e AS (
  SELECT e0.src AS s, e0.dst AS z, CAST({scale} AS BIGINT) // deg.d AS term
  FROM e0 JOIN deg ON e0.dst = deg.dst
)
SELECT a.s AS sa, b.s AS sb,
       CAST(COUNT(*) AS BIGINT) AS n_common,
       CAST(SUM(a.term) AS BIGINT) AS ra_scaled
FROM e a JOIN e b ON a.z = b.z AND a.s < b.s
GROUP BY 1, 2
"""


def reach_summary(
    edges: DataFrame,
    source: int,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Single-source reach profile within ``max_hops``: how many nodes
    are reachable, the capped eccentricity (max hop count seen), and
    the harmonic centrality contribution Σ 1e6 div hops in exact
    integer ppm — the no-logs, no-doubles closeness number (harmonic
    centrality handles disconnected graphs where classic closeness
    breaks).

    Rides :func:`bfs_hops` unchanged (frontier joins, anti-join
    dedupe, checkpointed rounds), then one map-combinable aggregate
    over the (node, hops) relation — the summary costs nothing beyond
    the BFS itself.  Returns one row: (n_reached,
    eccentricity_capped, harmonic_ppm); NULL eccentricity/harmonic
    when nothing is reachable.
    """
    hops = bfs_hops(edges, source, max_hops, src_col, dst_col)
    return hops.filter(F.col("hops") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        F.max("hops").cast("bigint").alias("eccentricity_capped"),
        F.sum(F.expr("CAST(1000000 AS BIGINT) div hops"))
        .cast("bigint")
        .alias("harmonic_ppm"),
    )


def reach_summary_sql(edges_sql: str, source: int, max_hops: int) -> str:
    bfs = bfs_hops_sql(edges_sql, source, max_hops)
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(MAX(hops) AS BIGINT) AS eccentricity_capped,
       CAST(SUM(CAST(1000000 AS BIGINT) // hops) AS BIGINT) AS harmonic_ppm
FROM ({bfs}) b
WHERE hops > 0
"""


def degree_assortativity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Newman degree assortativity: the Pearson correlation of
    (deg(u), deg(v)) over the directed edge instances — positive when
    hubs attach to hubs (social-style graphs), negative when hubs
    attach to leaves (web/trade-style), the one-number mixing pattern
    read before betting on a partitioning strategy.

    Rides :func:`operators.profile.correlation`'s exact-integer
    moment machinery (degree products as DECIMAL(38,0) sums, one
    sqrt/divide tail — bit-identical across engines, unlike built-in
    ``corr``).  Degrees count BOTH endpoints of every edge (total
    degree), so every edge's src AND dst are present in the degree
    relation by construction and no edge can silently drop — a
    src-only degree count would inner-join away any edge whose dst is
    a pure sink (a directed star returned zero rows before this was
    a both-endpoints count).  On a symmetric edge list this is
    Newman's undirected assortativity; on a directed list it is the
    (total-degree, total-degree) variant.

    Returns one row per non-empty edge list: (n_edges, assortativity)
    — assortativity NULL when either side's degree variance is zero
    (a regular graph, or a star's constant-degree side).
    """
    from gis_city_county_spark.operators.profile import correlation

    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # Three consumers of `edges` (both degree endpoints + the pair
    # relation): materialize expensive lineage once, and build both
    # endpoints with one row-local explode instead of a self-union
    # (guide SS2.4/SS3.3).
    edges = _materialize_for_multipass(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    src_col, dst_col = "src", "dst"
    endpoints = edges.select(
        F.explode(F.array(src_col, dst_col)).alias("__node")
    )
    deg = endpoints.groupBy("__node").agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    )
    pairs = (
        edges.select(F.col(src_col).alias("__u"), F.col(dst_col).alias("__v"))
        .join(
            deg.select(F.col("__node").alias("__u"), F.col("__deg").alias("__du")),
            "__u",
        )
        .join(
            deg.select(F.col("__node").alias("__v"), F.col("__deg").alias("__dv")),
            "__v",
        )
        .select(F.lit("all").alias("__g"), "__du", "__dv")
    )
    out = correlation(pairs, "__g", "__du", "__dv")
    return out.select(
        F.col("n").cast("bigint").alias("n_edges"),
        F.col("pearson_r").alias("assortativity"),
    )


def degree_assortativity_sql(edges_sql: str) -> str:
    from gis_city_county_spark.operators.profile import correlation_sql

    # edges materialized ONCE and the degree relation built once from
    # both endpoints (a src-only degree subquery interpolated twice
    # evaluated the edge derivation three times AND dropped edges
    # into pure sinks)
    src = f"""
WITH ed AS MATERIALIZED ({edges_sql}),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT src AS node FROM ed UNION ALL SELECT dst AS node FROM ed
  ) GROUP BY node
)
SELECT 'all' AS g, du.deg AS du, dv.deg AS dv
FROM ed e
JOIN deg du ON du.node = e.src
JOIN deg dv ON dv.node = e.dst
"""
    inner = correlation_sql(src, "g", "du", "dv")
    return f"""
SELECT CAST(n AS BIGINT) AS n_edges, pearson_r AS assortativity
FROM ({inner})
"""


def clustering_coefficient(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Global transitivity and average LOCAL clustering coefficient in
    exact integer ppm — "how cliquish is this graph", the standard
    structure probe next to the degree histogram and assortativity.

    The edge list is canonicalized to distinct undirected a<b pairs
    (self-loops dropped), triangles enumerate through the standard
    two-equi-join (a<b<c orientation — each triangle counted exactly
    once), per-node triangle counts come from exploding the three
    corners, and the two coefficients are single exact divisions:

    * ``transitivity_ppm`` = 3·triangles·1e6 div open+closed wedges,
      where wedges = Σ_v deg(v)·(deg(v)−1)/2;
    * ``avg_local_cc_ppm`` = (Σ_v cc_ppm(v)) div |{v: deg(v) ≥ 2}|,
      with cc_ppm(v) = 2·tri(v)·1e6 div (deg(v)·(deg(v)−1)) — each
      node's coefficient floors at ppm precision FIRST, then the
      average floors once more, identically on both engines (a
      double mean would accumulate in engine-dependent order).

    Scale: triangles via join fan-out bounded by max degree (a
    degree-ordered orientation keeps the standard bound); everything
    else is one degree aggregate and one corner explode — shuffle ∝
    edges + triangles.  Output is ONE row: (n_nodes, n_edges,
    n_triangles, n_wedges, transitivity_ppm, avg_local_cc_ppm); the
    ratios are NULL on wedge-free / all-degree-1 graphs.
    """
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # `und` feeds five consumers (the degree count and three triangle
    # join legs); materialize expensive lineage ONCE instead of
    # replaying the canonicalize+distinct subtree per reference
    # (guide SS3.3 / SS5 — the plan held 44 parquet scans before).
    und = _materialize_for_multipass(
        edges.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    # endpoint/corner fan-outs as row-local explodes, not self-unions:
    # a union of k selects over the same frame evaluates it k times.
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("__node"))
        .groupBy("__node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__deg"))
    )
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        und.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("__node"))
        .groupBy("__node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tri"))
    )
    per_node = deg.join(corners, "__node", "left").select(
        "__node",
        "__deg",
        F.coalesce("__tri", F.lit(0)).cast("bigint").alias("__tri"),
        F.expr("__deg * (__deg - 1) div 2").alias("__wedges"),
        F.when(
            F.col("__deg") >= 2,
            # coalesce INSIDE the expression: the select list's aliased
            # __tri does not shadow the join input's nullable column
            F.expr(
                "(2 * coalesce(__tri, 0) * CAST(1000000 AS BIGINT))"
                " div (__deg * (__deg - 1))"
            ),
        ).alias("__cc_ppm"),
    )
    return per_node.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.expr("CAST(sum(__deg) div 2 AS BIGINT)").alias("n_edges"),
        F.expr("CAST(sum(__tri) div 3 AS BIGINT)").alias("n_triangles"),
        F.sum("__wedges").cast("bigint").alias("n_wedges"),
        F.expr(
            "CASE WHEN sum(__wedges) > 0 THEN"
            " CAST(sum(__tri) * CAST(1000000 AS BIGINT)"
            "      div sum(__wedges) AS BIGINT) END"
        ).alias("transitivity_ppm"),
        F.expr(
            "CASE WHEN count(__cc_ppm) > 0 THEN"
            " CAST(sum(__cc_ppm) div count(__cc_ppm) AS BIGINT) END"
        ).alias("avg_local_cc_ppm"),
    )


def clustering_coefficient_sql(edges_sql: str) -> str:
    return f"""
WITH raw AS MATERIALIZED ({edges_sql}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE LEAST(src, dst) < GREATEST(src, dst)
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY node
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
),
per_node AS (
  SELECT d.node, d.deg, COALESCE(c.tri, 0) AS tri,
         d.deg * (d.deg - 1) // 2 AS wedges,
         CASE WHEN d.deg >= 2 THEN
           (2 * COALESCE(c.tri, 0) * CAST(1000000 AS BIGINT))
           // (d.deg * (d.deg - 1)) END AS cc_ppm
  FROM deg d LEFT JOIN corners c ON c.node = d.node
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(deg) // 2 AS BIGINT) AS n_edges,
       CAST(SUM(tri) // 3 AS BIGINT) AS n_triangles,
       CAST(SUM(wedges) AS BIGINT) AS n_wedges,
       CASE WHEN SUM(wedges) > 0 THEN
         CAST(SUM(tri) * CAST(1000000 AS BIGINT) // SUM(wedges) AS BIGINT)
       END AS transitivity_ppm,
       CASE WHEN COUNT(cc_ppm) > 0 THEN
         CAST(SUM(cc_ppm) // COUNT(cc_ppm) AS BIGINT)
       END AS avg_local_cc_ppm
FROM per_node
"""


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    top_k: int = 20,
    max_group_size: int | None = 64,
) -> DataFrame:
    """Bipartite co-occurrence projection: for items appearing in
    shared groups (suppliers sharing parts, tokens sharing documents,
    products sharing baskets), the pair weight is the number of
    DISTINCT groups containing both — the classic "also supplied by"
    / market-basket projection.

    Scale shape: the projection self-joins the DISTINCT (group, item)
    relation on group, so the RAW fan-out is C(m,2) per group where m
    is the group's item count — quadratic in the largest group, the
    one shape in this package whose work grows faster than its input
    on power-law data.  ``max_group_size`` (default 64) bounds it BY
    CONSTRUCTION: groups with more distinct items are first
    md5-rank-sampled down to the cap (deterministic — the same items
    survive on every engine, every run, every partitioning), so
    per-group fan-out never exceeds C(cap,2) and total work is
    O(rows · cap) instead of O(Σ m²).  The sampling window is
    group-partitioned (never a global sort), the pair aggregate is
    map-combinable, and the final top-k is a TakeOrdered.  Truncated
    weights are a documented UNDER-count for oversized groups — audit
    which groups were capped with
    :func:`cooccurrence_truncation_report`, and pass
    ``max_group_size=None`` only when group membership is known
    bounded (TPC-H parts have ≤4 suppliers at every SF).

    Ties break by (item_a, item_b).  Returns
    (item_a, item_b, n_shared_groups) — ``top_k`` rows, item_a <
    item_b canonical order.
    """
    gi = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("__i")
    ).distinct()
    if max_group_size is not None:
        w = Window.partitionBy("__g").orderBy(
            F.md5(F.col("__i").cast("string")), F.col("__i")
        )
        gi = (
            gi.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_group_size)
            .drop("__rk")
        )
    # r12: after the cap every group holds ≤ max_group_size distinct
    # items, so the pair fan-out is ROW-LOCAL — collect each group's
    # sorted item array (reuses the cap window's hash clustering on
    # __g, no new exchange) and explode the C(m,2) ordered pairs from
    # one evaluation, instead of self-joining two copies of the
    # distinct+cap subtree (guide §2.4/§3.3: the join evaluated that
    # subtree twice AND paid the join exchange; item_a < item_b falls
    # out of the ascending sort, and collect_list dropping NULL items
    # matches the old `NULL < x` filter semantics).
    grouped = gi.groupBy("__g").agg(
        F.array_sort(F.collect_list("__i")).alias("__items")
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(__items, (x, i) ->"
                " transform(slice(__items, i + 2, size(__items)),"
                " y -> struct(x AS item_a, y AS item_b))))"
            )
        ).alias("__p")
    ).select("__p.item_a", "__p.item_b")
    return (
        pairs
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_groups"))
        .orderBy(
            F.col("n_shared_groups").desc(),
            F.col("item_a").asc(),
            F.col("item_b").asc(),
        )
        .limit(top_k)
    )


def cooccurrence_pairs_sql(
    source_sql: str,
    group_col: str,
    item_col: str,
    top_k: int = 20,
    max_group_size: int | None = 64,
) -> str:
    if max_group_size is not None:
        gi = f"""
  SELECT g, i FROM (
    SELECT g, i,
           ROW_NUMBER() OVER (
             PARTITION BY g ORDER BY md5(CAST(i AS VARCHAR)), i
           ) AS rk
    FROM (SELECT DISTINCT {group_col} AS g, {item_col} AS i
          FROM ({source_sql}))
  ) WHERE rk <= {max_group_size}"""
    else:
        gi = (
            f"\n  SELECT DISTINCT {group_col} AS g, {item_col} AS i"
            f" FROM ({source_sql})"
        )
    return f"""
WITH gi AS ({gi}
)
SELECT a.i AS item_a, b.i AS item_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_groups
FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
GROUP BY a.i, b.i
ORDER BY n_shared_groups DESC, item_a ASC, item_b ASC
LIMIT {top_k}
"""


def cooccurrence_truncation_report(
    df: DataFrame, group_col: str, item_col: str, max_group_size: int = 64
) -> DataFrame:
    """The loud half of the :func:`cooccurrence_pairs` bound: one row
    per OVERSIZED group (distinct item count > ``max_group_size``)
    with its true size and the pair count the cap discards — run it
    alongside a capped projection so truncation is an audited,
    quantified decision instead of a silent under-count.

    Scale shape: one map-combinable count-distinct per group and a
    scan-side filter — no self-join, safe at any skew.  Returns
    (group_id, n_items, n_pairs_true, n_pairs_kept, n_pairs_dropped)
    sorted by n_items desc (tie: group_id) — bounded output: only
    groups past the cap.
    """
    cap = F.lit(max_group_size).cast("bigint")
    n = F.col("n_items")
    return (
        df.groupBy(F.col(group_col).alias("group_id"))
        .agg(F.count_distinct(F.col(item_col)).alias("n_items"))
        .filter(n > cap)
        .select(
            "group_id",
            "n_items",
            (n * (n - 1) / 2).cast("bigint").alias("n_pairs_true"),
            (cap * (cap - 1) / 2).cast("bigint").alias("n_pairs_kept"),
            (n * (n - 1) / 2 - cap * (cap - 1) / 2)
            .cast("bigint")
            .alias("n_pairs_dropped"),
        )
        .orderBy(F.col("n_items").desc(), F.col("group_id").asc())
    )


def ego_sample(
    edges: DataFrame,
    seed_fraction: float = 0.02,
    k: int = 8,
) -> DataFrame:
    """Bounded 2-hop ego-network sample — the neighborhood loader a
    GNN training pipeline materializes (GraphSAGE-style fan-out
    sampling): a deterministic hash-sample of seed nodes, then at
    most ``k`` 1-hop neighbors per seed and ``k`` 2-hop neighbors per
    kept 1-hop node, each chosen by md5 rank so the SAME sample comes
    back on every engine, every run, every partitioning (seeded RNG
    sampling resamples under repartition — useless for reproducible
    epochs).

    Scale shape: seeds via the hash-sample predicate (scan-side);
    each hop is one equi-join on the edge relation plus a
    (parent-partitioned, ≤degree rows) rank window — fan-out is
    capped at k then k² rows per seed BY CONSTRUCTION, the property
    that makes 2-hop sampling feasible on power-law graphs where the
    raw 2-hop neighborhood explodes.  2-hop rows may revisit nodes
    (standard GraphSAGE semantics — sampling is per parent edge);
    the seed itself is excluded from its own 2-hop frontier.

    Returns (seed, hop, parent, node) — hop ∈ {1, 2}; for hop 1,
    parent = seed.
    """
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )
    from gis_city_county_spark.operators.sketch import _h60

    # three consumers of `edges` (the seed census + both hop joins):
    # materialize expensive lineage once (guide §3.3 — the registered
    # trade-graph edge relation is a join+distinct, and the r12-before
    # plan re-evaluated it per reference: 40 parquet scans)
    edges = _materialize_for_multipass(edges)
    nodes = edges.select(F.col("src").alias("seed")).distinct()
    seeds = nodes.filter(
        _h60(F.concat(F.lit("ego|"), F.col("seed").cast("string")))
        < int(seed_fraction * float(1 << 60))
    )
    w1 = Window.partitionBy("seed").orderBy("__r", "node")
    hop1 = (
        seeds.join(edges, seeds.seed == edges.src)
        .select(
            "seed",
            F.col("dst").alias("node"),
            _h60(F.concat(F.lit("h1|"), F.col("seed").cast("string"),
                          F.lit("|"), F.col("dst").cast("string")))
            .alias("__r"),
        )
        .withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .select("seed", F.col("node"))
        # hop1 feeds the hop-2 join AND the output union — truncate
        # the seed-join+rank subtree once (≤ k rows per seed)
        .localCheckpoint(eager=False)
    )
    w2 = Window.partitionBy("seed", "parent").orderBy("__r", "node")
    hop2 = (
        hop1.withColumnRenamed("node", "parent")
        .join(edges, F.col("parent") == edges.src)
        .filter(F.col("dst") != F.col("seed"))
        .select(
            "seed",
            "parent",
            F.col("dst").alias("node"),
            _h60(F.concat(F.lit("h2|"), F.col("seed").cast("string"),
                          F.lit("|"), F.col("parent").cast("string"),
                          F.lit("|"), F.col("dst").cast("string")))
            .alias("__r"),
        )
        .withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .select("seed", F.lit(2).cast("int").alias("hop"), "parent", "node")
    )
    out1 = hop1.select(
        "seed", F.lit(1).cast("int").alias("hop"),
        F.col("seed").alias("parent"), "node",
    )
    return out1.unionByName(hop2)


def ego_sample_sql(
    edges_sql: str, seed_fraction: float = 0.02, k: int = 8
) -> str:
    from gis_city_county_spark.operators.sketch import _h60_sql

    seed_h = _h60_sql("'ego|' || CAST(seed AS VARCHAR)")
    h1 = _h60_sql("'h1|' || CAST(seed AS VARCHAR) || '|' || CAST(dst AS VARCHAR)")
    h2 = _h60_sql(
        "'h2|' || CAST(p.seed AS VARCHAR) || '|' || CAST(p.node AS VARCHAR)"
        " || '|' || CAST(e.dst AS VARCHAR)"
    )
    return f"""
WITH e AS ({edges_sql}),
seeds AS (
  SELECT seed FROM (SELECT DISTINCT src AS seed FROM e)
  WHERE {seed_h} < {int(seed_fraction * float(1 << 60))}
),
h1 AS (
  SELECT seed, node FROM (
    SELECT s.seed, e.dst AS node,
           ROW_NUMBER() OVER (PARTITION BY s.seed
                              ORDER BY {h1}, e.dst) AS rk
    FROM seeds s JOIN e ON s.seed = e.src
  ) WHERE rk <= {k}
),
h2 AS (
  SELECT seed, parent, node FROM (
    SELECT p.seed, p.node AS parent, e.dst AS node,
           ROW_NUMBER() OVER (PARTITION BY p.seed, p.node
                              ORDER BY {h2}, e.dst) AS rk
    FROM h1 p JOIN e ON p.node = e.src
    WHERE e.dst != p.seed
  ) WHERE rk <= {k}
)
SELECT seed, CAST(1 AS INTEGER) AS hop, seed AS parent, node FROM h1
UNION ALL
SELECT seed, CAST(2 AS INTEGER) AS hop, parent, node FROM h2
"""
