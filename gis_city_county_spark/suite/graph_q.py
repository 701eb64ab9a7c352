"""Graph query: integer-scaled PageRank over the supplier↔customer
trade graph (who supplied whose orders), edges both directions so
rank circulates. Node ids are disambiguated into one keyspace:
supplier s → 2s, customer c → 2c+1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.graph import pagerank, pagerank_sql
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
    return pairs.select(
        F.col("s_node").alias("src"), F.col("c_node").alias("dst")
    ).unionByName(
        pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
    )


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


SPECS = [
    QuerySpec("graph_pagerank_trade", q_pagerank_trade, _PR_ORACLE),
]
