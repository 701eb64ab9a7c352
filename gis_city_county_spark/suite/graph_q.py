"""Graph query: integer-scaled PageRank over the supplier↔customer
trade graph (who supplied whose orders), edges both directions so
rank circulates. Node ids are disambiguated into one keyspace:
supplier s → 2s, customer c → 2c+1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.graph import (
    kcore,
    kcore_sql,
    label_propagation,
    label_propagation_sql,
    pagerank,
    pagerank_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec

_ITERS, _SCALE = 5, 1_000_000


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("s_node"),
            (F.col("o_custkey") * 2 + 1).alias("c_node"),
        )
        .distinct()
    )
    # Both directions via one row-local explode instead of a
    # self-union: a union of two selects over `pairs` executes the
    # join+distinct subtree TWICE per downstream action (guide SS2.4 —
    # remove recomputation, not just shuffles); the explode emits the
    # same rows from one evaluation.
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s_node").alias("src"), F.col("c_node").alias("dst")
                ),
                F.struct(
                    F.col("c_node").alias("src"), F.col("s_node").alias("dst")
                ),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")


def q_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration deterministic PageRank over the bidirectional
    supplier↔customer graph."""
    return pagerank(_trade_edges(spark, sf_dir), iters=_ITERS, scale=_SCALE)


_EDGES_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_suppkey * 2 AS s_node, o_custkey * 2 + 1 AS c_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT s_node AS src, c_node AS dst FROM pairs
UNION ALL
SELECT c_node AS src, s_node AS dst FROM pairs
"""

_PR_ORACLE = pagerank_sql(_EDGES_SQL, iters=_ITERS, scale=_SCALE)


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the nation-level trade graph (nations
    adjacent when any supplier in one shipped to a customer in the
    other): canonical a<b<c edge orientation, two equi-joins — the
    standard relational triangle enumeration, with the per-nation
    participation count. Edge derivation shuffles lineitem once; the
    joins run on the tiny distinct nation-pair relation. On a big
    graph the same plan holds with degree-ordered orientation, which
    bounds the join fan-out by max degree."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # pairs feeds e1/e2/e3 — three references replay the 4-table
    # join+distinct lineage per reference (the r12-before plan held
    # 40 Exchange / 72 parquet scans); materialize it once (guide
    # §3.3)
    pairs = _materialize_for_multipass(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    e1 = pairs
    e2 = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = pairs.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    # all three corners from ONE evaluation of the triangle relation
    # via a row-local explode, not a 3-way self-union (guide §2.4)
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("nation"))
    return (
        nodes.groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("nation")
    )


_TRI_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT least(s_nationkey, c_nationkey) AS a,
                  greatest(s_nationkey, c_nationkey) AS b
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  WHERE s_nationkey <> c_nationkey
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.a = e1.b
  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT a AS nation FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT nation, COUNT(*) AS n_triangles FROM nodes GROUP BY nation ORDER BY nation
"""


_BFS_SOURCE, _BFS_HOPS = 2, 3  # node 2 = supplier 1 in the 2s/2c+1 keyspace


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the supplier↔customer trade graph:
    shortest hop count to every node within 3 hops of supplier 1
    (operators.graph.bfs_hops — frontier joins with anti-join
    dedupe, localCheckpoint per round, early exit)."""
    from gis_city_county_spark.operators.graph import bfs_hops

    return bfs_hops(_trade_edges(spark, sf_dir), _BFS_SOURCE, _BFS_HOPS)


def _bfs_oracle() -> str:
    from gis_city_county_spark.operators.graph import bfs_hops_sql

    return bfs_hops_sql(_EDGES_SQL, _BFS_SOURCE, _BFS_HOPS)


_BFS_ORACLE = _bfs_oracle()


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree distribution of the trade graph in powers-of-two
    bands (plus exact min/max degree per band) — the structure scan
    run before choosing partition/skew strategies for graph
    algorithms; hubs live in the top bands."""
    edges = _trade_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    band = F.floor(F.log2("deg")).cast("long")
    return (
        deg.withColumn("band", band)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("deg").alias("min_deg"),
            F.max("deg").alias("max_deg"),
        )
    )


# floor(log2(n)) over positive integers is exact in double for any
# realistic degree, and both engines evaluate the identical log2.
_DEGREE_ORACLE = f"""
WITH edges AS ({_EDGES_SQL}),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)
SELECT CAST(FLOOR(log2(deg)) AS BIGINT) AS band,
       COUNT(*) AS n_nodes, MIN(deg) AS min_deg, MAX(deg) AS max_deg
FROM deg GROUP BY 1
"""


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction between sampled supplier
    pairs: suppliers sharing many customers are likely future trade
    partners. Scores = shared-customer count and exact neighborhood
    Jaccard (ppm) for every sampled supplier pair with ≥1 shared
    customer — all via one self-join on the shared-neighbor key, the
    standard CN/Jaccard link-prediction program."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # edges feeds deg + both sides of the shared-neighbor self-join —
    # materialize the join+distinct lineage once (guide §3.3; the
    # r12-before plan held 22 Exchange / 16 parquet scans)
    edges = _materialize_for_multipass(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
        .filter(F.col("s") % 20 == 0)
    )
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    a = edges.select(F.col("s").alias("sa"), "c")
    b = edges.select(F.col("s").alias("sb"), "c")
    cn = (
        a.join(b, "c")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da = deg.select(F.col("s").alias("sa"), F.col("n").alias("n_a"))
    db = deg.select(F.col("s").alias("sb"), F.col("n").alias("n_b"))
    return (
        cn.join(da, "sa")
        .join(db, "sb")
        .select(
            "sa",
            "sb",
            "n_common",
            "n_a",
            "n_b",
            F.expr(
                "CAST((CAST(n_common AS DECIMAL(38,0)) * 1000000)"
                " div (n_a + n_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


_LINKPRED_ORACLE = """
WITH edges AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 20 = 0
),
deg AS (SELECT s, COUNT(*) AS n FROM edges GROUP BY s),
cn AS (
  SELECT a.s AS sa, b.s AS sb, COUNT(*) AS n_common
  FROM edges a JOIN edges b USING (c)
  WHERE a.s < b.s
  GROUP BY 1, 2
)
SELECT sa, sb, n_common, da.n AS n_a, db.n AS n_b,
       CAST(CAST(n_common AS HUGEINT) * 1000000
            // (da.n + db.n - n_common) AS BIGINT) AS jaccard_ppm
FROM cn
JOIN deg da ON da.s = sa
JOIN deg db ON db.s = sb
"""


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the nation partition over the (undirected)
    supplier–customer trade graph: Q = Σᵢ (eᵢ/m − (aᵢ/2m)²) — how much
    more within-nation trade exists than a random wiring predicts. All
    inputs are exact integer edge/degree counts; Q is a fixed-order
    double fold over ≤25 communities (sorted by community id)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # four consumers (edge count, both degree endpoints, the
    # within-community count): materialize the join+distinct lineage
    # once (guide §3.3 — the r12-before plan held 32 parquet scans)
    edges = _materialize_for_multipass(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_suppkey", "o_custkey")
        .distinct()
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("s_nationkey").alias("na"), F.col("c_nationkey").alias("nb")
        )
    )
    m = edges.groupBy().agg(F.count(F.lit(1)).alias("m"))
    # per-community degree = edges touching the community (each edge
    # contributes 1 to each endpoint's community); both endpoints via
    # one row-local explode, not a self-union that evaluates the edge
    # frame twice (guide §2.4)
    deg = (
        edges.select(F.explode(F.array("na", "nb")).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    # per-community term e_i/m − (a/2m)²; folded in sorted community
    # order for a fixed double-summation sequence
    e_within_c = (
        edges.filter(F.col("na") == F.col("nb"))
        .groupBy(F.col("na").alias("c"))
        .agg(F.count(F.lit(1)).alias("e_i"))
    )
    terms = (
        deg.join(e_within_c, "c", "left")
        .fillna(0, ["e_i"])
        .crossJoin(F.broadcast(m))
        .withColumn(
            "term",
            F.col("e_i").cast("double") / F.col("m").cast("double")
            - (
                F.col("a").cast("double")
                / (2 * F.col("m")).cast("double")
            )
            * (
                F.col("a").cast("double")
                / (2 * F.col("m")).cast("double")
            ),
        )
    )
    return terms.groupBy().agg(
        F.max("m").alias("m_edges"),
        F.count(F.lit(1)).alias("n_communities"),
        F.aggregate(
            F.expr("transform(array_sort(collect_list(struct(c, term))), p -> p.term)"),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("modularity"),
    )


_MODULARITY_ORACLE = """
WITH edges AS (
  SELECT DISTINCT s.s_nationkey AS na, c.c_nationkey AS nb
                  , l.l_suppkey, o.o_custkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
e2 AS (SELECT na, nb FROM (SELECT DISTINCT l_suppkey, o_custkey, na, nb FROM edges) t),
m AS (SELECT COUNT(*) AS m FROM e2),
deg AS (
  SELECT c, COUNT(*) AS a FROM (
    SELECT na AS c FROM e2 UNION ALL SELECT nb AS c FROM e2) t GROUP BY c
),
ew AS (SELECT na AS c, COUNT(*) AS e_i FROM e2 WHERE na = nb GROUP BY na),
terms AS (
  SELECT deg.c,
         CAST(COALESCE(ew.e_i, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
         - (CAST(deg.a AS DOUBLE) / CAST(2 * m.m AS DOUBLE))
           * (CAST(deg.a AS DOUBLE) / CAST(2 * m.m AS DOUBLE)) AS term
  FROM deg LEFT JOIN ew USING (c) CROSS JOIN m
)
SELECT (SELECT CAST(m AS BIGINT) FROM m) AS m_edges,
       COUNT(*) AS n_communities,
       list_reduce(list_prepend(0.0, list(term ORDER BY c)), (x, y) -> x + y)
         AS modularity
FROM terms
"""


_KCORE_K, _KCORE_ROUNDS = 8, 6


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-core of the trade graph: iterative peel of nodes with fewer
    than 8 distinct trading partners — the dense trading backbone."""
    return kcore(_trade_edges(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS)


_KCORE_ORACLE = kcore_sql(_EDGES_SQL, k=_KCORE_K, rounds=_KCORE_ROUNDS)

_LPA_ROUNDS = 4


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4 synchronous label-propagation rounds over the trade graph —
    deterministic fixed-round communities (min-label tiebreak)."""
    return label_propagation(_trade_edges(spark, sf_dir), rounds=_LPA_ROUNDS)


_LPA_ORACLE = label_propagation_sql(_EDGES_SQL, rounds=_LPA_ROUNDS)


def q_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction between sampled supplier
    pairs (Σ 1/deg over shared customers, exact `scale div deg`
    integer terms — the no-libm Adamic-Adar) over the same sampled
    trade graph as graph_link_prediction."""
    from gis_city_county_spark.operators.graph import resource_allocation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst"))
        .distinct()
        .filter(F.col("src") % 20 == 0)
    )
    return resource_allocation(edges)


def _ra_oracle() -> str:
    from gis_city_county_spark.operators.graph import resource_allocation_sql

    return resource_allocation_sql("""
  SELECT DISTINCT l_suppkey AS src, o_custkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey % 20 = 0
""")


def q_reach_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source reach profile of supplier 1 within 3 hops:
    reachable-node count, capped eccentricity, and exact-integer
    harmonic centrality ppm — one aggregate over the BFS relation."""
    from gis_city_county_spark.operators.graph import reach_summary

    return reach_summary(_trade_edges(spark, sf_dir), _BFS_SOURCE, _BFS_HOPS)


def _reach_oracle() -> str:
    from gis_city_county_spark.operators.graph import reach_summary_sql

    return reach_summary_sql(_EDGES_SQL, _BFS_SOURCE, _BFS_HOPS)


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the trade graph — hubs-to-hubs
    vs hubs-to-leaves mixing in one exact-moment Pearson number."""
    from gis_city_county_spark.operators.graph import degree_assortativity

    return degree_assortativity(_trade_edges(spark, sf_dir))


def _assortativity_oracle() -> str:
    from gis_city_county_spark.operators.graph import (
        degree_assortativity_sql,
    )

    return degree_assortativity_sql(_EDGES_SQL)


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity + average local clustering coefficient of the
    supplier CO-SUPPLY graph (suppliers adjacent when they supplied
    the same order) — the trade graph itself is bipartite and
    triangle-free, so the one-mode projection is where cliquishness
    lives.  Per-order supplier fan-out is bounded (≤7 lineitems per
    TPC-H order), so the projection join is bounded fan-out, never a
    blowup."""
    from gis_city_county_spark.operators.graph import clustering_coefficient

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .distinct()
    )
    return clustering_coefficient(edges)


_COSUPPLY_EDGES_SQL = """
SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
"""


def _clustering_oracle() -> str:
    from gis_city_county_spark.operators.graph import (
        clustering_coefficient_sql,
    )

    return clustering_coefficient_sql(_COSUPPLY_EDGES_SQL)


def q_cooccurrence(spark, sf_dir):
    """Supplier co-occurrence projection over shared parts (lineitem
    bipartite graph): top-20 supplier pairs by distinct shared parts.
    Fan-out is bounded twice: naturally (TPC-H parts have <= 4
    suppliers at every SF) and by the operator's default
    ``max_group_size=64`` md5-rank cap (a no-op here, mirrored in the
    oracle), so the driver hash-checks the capped plan — the one
    that survives power-law groups at 100x."""
    from gis_city_county_spark.operators.graph import cooccurrence_pairs

    li = load_table(spark, sf_dir, "lineitem")
    return cooccurrence_pairs(li, "l_partkey", "l_suppkey", top_k=20)


def _cooccurrence_oracle() -> str:
    from gis_city_county_spark.operators.graph import cooccurrence_pairs_sql

    return cooccurrence_pairs_sql(
        "SELECT * FROM lineitem", "l_partkey", "l_suppkey", top_k=20
    )


def q_ego_sample(spark, sf_dir):
    """Bounded 2-hop GraphSAGE-style ego sample over the trade graph:
    2% hash-sampled seeds, <= 8 neighbors per hop per parent, all
    choices md5-ranked so every engine draws the same epochs."""
    from gis_city_county_spark.operators.graph import ego_sample

    return ego_sample(_trade_edges(spark, sf_dir), seed_fraction=0.02, k=8)


_EGO_EDGES_SQL = """
WITH pairs AS (
  SELECT DISTINCT l_suppkey * 2 AS s_node, o_custkey * 2 + 1 AS c_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT s_node AS src, c_node AS dst FROM pairs
UNION ALL
SELECT c_node AS src, s_node AS dst FROM pairs
"""


def _ego_oracle() -> str:
    from gis_city_county_spark.operators.graph import ego_sample_sql

    return ego_sample_sql(_EGO_EDGES_SQL, seed_fraction=0.02, k=8)


SPECS = [
    QuerySpec("graph_ego_sample", q_ego_sample, _ego_oracle()),
    QuerySpec("graph_cooccurrence_pairs", q_cooccurrence,
              _cooccurrence_oracle()),
    QuerySpec("graph_pagerank_trade", q_pagerank_trade, _PR_ORACLE),
    QuerySpec("graph_clustering_coefficient", q_clustering_coefficient,
              _clustering_oracle()),
    QuerySpec("graph_reach_summary", q_reach_summary, _reach_oracle()),
    QuerySpec("graph_degree_assortativity", q_degree_assortativity,
              _assortativity_oracle()),
    QuerySpec("graph_resource_allocation", q_resource_allocation, _ra_oracle()),
    QuerySpec("graph_kcore_trade", q_kcore, _KCORE_ORACLE),
    QuerySpec("graph_label_propagation", q_label_propagation, _LPA_ORACLE),
    QuerySpec("graph_modularity_nations", q_modularity, _MODULARITY_ORACLE),
    QuerySpec("graph_degree_histogram", q_degree_histogram, _DEGREE_ORACLE),
    QuerySpec("graph_link_prediction", q_link_prediction, _LINKPRED_ORACLE),
    QuerySpec("graph_triangle_count", q_triangle_count, _TRI_ORACLE),
    QuerySpec("graph_bfs_hops", q_bfs_hops, _BFS_ORACLE),
]
