"""Extended OLAP coverage: the rest of the TPC-H-shaped surface.

Widens :mod:`tpch` with the relational capabilities the first six
queries don't touch: semi/anti joins (EXISTS / NOT EXISTS), correlated
aggregates, conditional aggregation, disjunctive pushdown predicates,
ROLLUP + GROUPING, INTERSECT/EXCEPT, group-by-HAVING with join-back,
window-max selection, and JSON extraction. Query numbers follow the
TPC-H queries they are shaped after, adapted to the synthetic
warehouse's columns (no partsupp / shipmode / commitdate).

Scale notes (apply to every query here):
- filters are expressed directly over the scan so parquet pushdown +
  column pruning apply;
- dimension sides of joins are broadcast explicitly;
- fact-fact joins shuffle on the join key with partial aggregation
  pushed map-side by Catalyst;
- double aggregates route through DECIMAL(38,10) (functions.numeric)
  so results are order-independent and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_city_county_spark.functions.numeric import (
    dec_avg,
    dec_avg_sql,
    dec_sum,
    dec_sum_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ------------------------------------------------------------------ Q4

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — EXISTS semi-join: orders (one quarter) having at
    least one line shipped after the order date, counted by priority.
    The semi-join shuffles only the distinct probe keys."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey")
    return (
        orders.join(late, F.col("o_orderkey") == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------------------ Q7

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — bidirectional nation-pair volume by ship year.
    Nation is broadcast twice under different aliases; the only big
    shuffle is lineitem↔orders."""
    nation = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = F.broadcast(
        nation.filter(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.filter(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_ORACLE = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('NATION_1','NATION_2')
  AND nc.n_name IN ('NATION_1','NATION_2')
  AND ns.n_name != nc.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ------------------------------------------------------------------ Q8

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — a target nation's share of regional PROMO revenue per
    order year: conditional aggregation over a 6-way join."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust_nations = F.broadcast(
        nation.join(
            F.broadcast(region.select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = F.broadcast(
        nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(cust_nations, F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_nation, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (dec_sum(target_vol) / dec_sum(vol)).alias("mkt_share"),
            dec_sum(vol, "total_volume"),
        )
        .orderBy("o_year")
    )


_Q8_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(CAST(SUM(CAST(CASE WHEN ns.n_name = 'NATION_3'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
            AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
       / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS mkt_share,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'total_volume')}
FROM lineitem
JOIN part      ON l_partkey = p_partkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region    ON nc.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


# ------------------------------------------------------------------ Q9

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — profit by supplier nation and order year for parts
    matching a name pattern (LIKE pushdown on the dimension)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_ORACLE = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'sum_profit')}
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


# ------------------------------------------------------------------ Q10

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape — top 20 customers by revenue lost to returns in one
    quarter. Customer attach is broadcast; total order (revenue desc,
    custkey) makes the limit deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .join(
            F.broadcast(cust.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       c_acctbal
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ------------------------------------------------------------------ Q12

def q12_lateness_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — the synthetic warehouse has no shipmode/commitdate,
    so the classifier becomes ship lateness (days between order and
    ship date, bucketed); per bucket, conditional counts of
    high- vs low-priority orders. One shuffle join on orderkey, one
    aggregation over three buckets."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(days <= 30, F.lit("1_FAST"))
        .when(days <= 60, F.lit("2_MEDIUM"))
        .otherwise(F.lit("3_SLOW"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("lateness"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("lateness")
    )


_Q12_ORACLE = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN '1_FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN '2_MEDIUM'
            ELSE '3_SLOW' END AS lateness,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


# ------------------------------------------------------------------ Q13

def q13_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — distribution of order counts per customer,
    including zero-order customers (left outer join, two-level agg)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------------------------ Q14

def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — promo revenue share in one month (conditional
    aggregation; part is broadcast into the filtered scan)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (dec_sum(promo) * F.lit(100.0) / dec_sum(vol)).alias("promo_revenue_pct")
        )
    )


_Q14_ORACLE = """
SELECT CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
         AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) * 100.0
       / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
         AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# ------------------------------------------------------------------ Q15

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape — supplier(s) with max quarterly revenue, selected
    with a global window max (no second scan of the revenue agg)."""
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    w = Window.partitionBy()
    return (
        rev.withColumn("max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey,
         {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ------------------------------------------------------------------ Q17

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — revenue from orders below 20%% of the part's average
    quantity: the correlated aggregate becomes a per-part agg joined
    back to the fact (one extra shuffle on partkey, no recompute)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    li_b = li.join(
        F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li_b.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        dec_avg("l_quantity", "avg_qty")
    )
    return (
        li_b.join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((dec_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


_Q17_ORACLE = f"""
WITH li_b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
),
aq AS (
  SELECT l_partkey AS ap_key, {dec_avg_sql('l_quantity', 'avg_qty')}
  FROM li_b GROUP BY 1
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
       / 7.0 AS avg_yearly
FROM li_b JOIN aq ON l_partkey = ap_key
WHERE l_quantity < 0.5 * avg_qty
"""


# ------------------------------------------------------------------ Q18

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape — orders whose total quantity exceeds a threshold
    (group-HAVING), joined back for customer/order detail."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


_Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, {dec_sum_sql('l_quantity', 'sum_qty')}
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
) b
JOIN orders   ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


# ------------------------------------------------------------------ Q19

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — OR-of-ANDs predicate across the part join: Catalyst
    extracts the common l_partkey join plus per-branch filters."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    branch1 = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(1, 25)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 40)
        & F.col("l_quantity").between(10, 40)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return j.filter(branch1 | branch2 | branch3).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q19_ORACLE = f"""
SELECT {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 1 AND 25)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 40 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


# ------------------------------------------------------------------ Q22

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — wealthy customers with no orders: scalar-subquery
    average + NOT EXISTS anti-join, grouped by market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal_row = cust.filter(F.col("c_acctbal") > 0).agg(
        dec_avg("c_acctbal", "avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal_row)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


_Q22_ORACLE = f"""
SELECT c_mktsegment, COUNT(*) AS numcust, {dec_sum_sql('c_acctbal', 'totacctbal')}
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ------------------------------------------------------- ROLLUP / set ops

def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation) with an explicit grouping mask —
    subtotals and grand total in one pass (Catalyst expands to a
    single shuffle)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    base = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    mask = (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("int")
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dec_sum("c_acctbal", "total_bal"),
            mask.alias("gmask"),
        )
        .orderBy("gmask", "r_name", "n_name")
    )


_ROLLUP_ORACLE = f"""
SELECT r_name, n_name, COUNT(*) AS n_cust,
       {dec_sum_sql('c_acctbal', 'total_bal')},
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INTEGER) AS gmask
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY gmask, r_name, n_name
"""


def q_setops_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT over customer key sets: customers active in
    both 1996 and 1997 vs. only 1996."""
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    ).select("o_custkey").distinct()
    y97 = orders.filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    ).select("o_custkey").distinct()
    both = y96.intersect(y97).select(F.lit("both").alias("cohort"), "o_custkey")
    only96 = y96.exceptAll(y97).select(F.lit("only_1996").alias("cohort"), "o_custkey")
    return both.unionByName(only96)


_SETOPS_ORACLE = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT 'both' AS cohort, o_custkey FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT 'only_1996' AS cohort, o_custkey FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — Catalyst plans the two-phase
    expand + partial distinct aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events props column + aggregation —
    get_json_object stays JVM-side (Jackson), no UDF."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("k", "sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_JSON_ORACLE = f"""
SELECT event_type, COUNT(*) AS n_events,
       {dec_sum_sql("CAST(json_extract_string(props, '$.k') AS BIGINT)", 'sum_k')},
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ------------------------------------------------------------------ Q2

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — min-cost supplier per part (no partsupp table in the
    synthetic warehouse, so unit cost is derived from lineitem as
    min(extendedprice/quantity) per part×supplier). The correlated
    min-subquery becomes a window min over partkey — one shuffle on
    partkey, dimensions broadcast."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    cost = (
        li.join(F.broadcast(part.select("p_partkey", "p_name")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


_Q2_ORACLE = """
WITH cost AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM cost c
WHERE unit_cost = (SELECT MIN(unit_cost) FROM cost c2
                   WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


# ------------------------------------------------------------------ Q11

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — per-part value HAVING > fraction of the grand total.
    The scalar subquery (global total) is a 1-row broadcast cross-join
    against the grouped result; the grouped result is computed once and
    reused for both sides (Spark caches nothing here — the total is an
    extra reduce over the *grouped* rows, not a rescan of lineitem)."""
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    # Cast operands to decimal BEFORE multiplying: a double×double
    # product rounded to decimal(38,10) can differ by 1 ulp between
    # engines (shortest-repr vs exact-binary rounding); decimal×decimal
    # is exact and bit-identical everywhere.
    value_expr = F.col("l_extendedprice").cast("decimal(18,4)") * F.col(
        "l_quantity"
    ).cast("decimal(18,4)")
    value = (
        li.join(F.broadcast(supp.select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dec_sum(value_expr, "part_value"))
    )
    total = value.agg(dec_sum("part_value", "total_value"))
    return (
        value.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_Q11_ORACLE = f"""
WITH value AS (
  SELECT l_partkey,
         {dec_sum_sql(
             'CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))',
             'part_value')}
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM value
WHERE part_value > 0.001 * (
  SELECT CAST(CAST(SUM(CAST(part_value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
  FROM value)
ORDER BY part_value DESC, l_partkey
"""


# ------------------------------------------------------------------ Q16

def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — distinct suppliers per (brand, type, size) with a
    NOT-IN supplier exclusion. The NOT IN subquery is a broadcast
    left_anti join (the excluded set is tiny); count-distinct expands
    to a two-phase agg that Catalyst plans with partial aggregation."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    supp = load_table(spark, sf_dir, "supplier")
    excluded = supp.filter(F.col("s_name").like("%7")).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(excluded), F.col("l_suppkey") == excluded["s_suppkey"], "left_anti")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ------------------------------------------------------------------ Q20

def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — suppliers holding an outsized share of a part's 1996
    PROMO volume: per (supplier, part) quantity vs. a correlated
    per-part total (agg joined back on partkey), then a semi-join up to
    the supplier dimension. Two shuffles (partkey, then the semi-join
    probe on suppkey — distinct keys only)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_4")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    li_p = li.join(F.broadcast(part.select("p_partkey")),
                   F.col("l_partkey") == F.col("p_partkey"))
    pair_qty = li_p.groupBy("l_suppkey", "l_partkey").agg(dec_sum("l_quantity", "pair_qty"))
    # The correlated per-part total is a window sum over the pair
    # aggregates (quantities are integral, so the double→decimal
    # round-trip is exact): lineitem is scanned and shuffled exactly
    # once; the window re-shuffles only the (supplier, part) rollup.
    w = Window.partitionBy("l_partkey")
    heavy = (
        pair_qty.withColumn(
            "part_qty",
            F.sum(F.col("pair_qty").cast("decimal(38,10)")).over(w).cast("double"),
        )
        .filter(F.col("pair_qty") > F.lit(0.25) * F.col("part_qty"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        supp.join(heavy, F.col("s_suppkey") == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


_Q20_ORACLE = f"""
WITH li_p AS (
  SELECT l_suppkey, l_partkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
),
pair AS (
  SELECT l_suppkey, l_partkey, {dec_sum_sql('l_quantity', 'pair_qty')}
  FROM li_p GROUP BY 1, 2
),
shares AS (
  SELECT l_suppkey, pair_qty,
         CAST(CAST(SUM(CAST(pair_qty AS DECIMAL(38,10)))
                   OVER (PARTITION BY l_partkey) AS VARCHAR) AS DOUBLE) AS part_qty
  FROM pair
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_4')
  AND s_suppkey IN (
    SELECT l_suppkey FROM shares WHERE pair_qty > 0.25 * part_qty)
ORDER BY s_suppkey
"""


# ----------------------------------------------------- order statistics

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics per group: median and p90 quantity plus
    extremes. `percentile` is the exact (sort-based) aggregate — on
    integral quantities the interpolated results are exactly
    representable doubles, so they hash-match across engines. (The
    approximate sketch path for 100 TB is `approx_percentile`; the
    exact form is the oracle-able surface.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_PERCENTILE_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------------------------------------------------ Q21

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — suppliers that were the *sole* late shipper in a
    multi-supplier order. The textbook EXISTS + NOT-EXISTS pair would
    scan/shuffle the order-lines three times; instead the per-order
    counts (distinct suppliers, distinct late suppliers) are window
    aggregates over orderkey — lineitem is scanned once and shuffled
    once, and the EXISTS/NOT-EXISTS predicates become row filters
    (orders are ≤7 lines, so the per-group set is tiny)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    # EXISTS(other supplier)        ⇔ n_supp >= 2
    # NOT EXISTS(other late suppl.) ⇔ n_late_supp == 1 (itself — every
    # probe row below is late, so its own supplier is always counted)
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        lines.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
        )
        .filter(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
    )


_Q21_ORACLE = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM lines l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one row per user, one count column per event type (the
    wide activity-matrix shape). The pivot value list is declared, so
    Catalyst plans a single pass — one shuffle on user_id, no
    per-value scans."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )
    return wide.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES]
    )


_PIVOT_ORACLE = (
    "SELECT user_id, "
    + ", ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id"
)

_MELT_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_melt_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: lineitem's four numeric measures to long form
    (metric, val), re-aggregated per metric. The melt is a scan-side
    expand (no shuffle); the only exchange is the 4-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.melt(
        ids=[], values=_MELT_COLS, variableColumnName="metric", valueColumnName="val"
    )
    return (
        long.groupBy("metric")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("val", "total"))
        .orderBy("metric")
    )


_MELT_ORACLE = (
    "SELECT metric, COUNT(*) AS n, "
    + dec_sum_sql("val", "total")
    + " FROM ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS metric, {c} AS val FROM lineitem" for c in _MELT_COLS
    )
    + ") GROUP BY metric ORDER BY metric"
)


def q_cube_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, market segment): all four grouping combos
    (detail, per-region, per-segment, grand total) in ONE pass — the
    Expand operator replicates each input row per grouping set before
    a single shuffle, so the cost is 4× map output, not 4 scans."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    base = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    mask = (F.grouping("r_name") * 2 + F.grouping("c_mktsegment")).cast("int")
    return (
        base.cube("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dec_sum("c_acctbal", "total_bal"),
            mask.alias("gmask"),
        )
        .orderBy("gmask", "r_name", "c_mktsegment")
    )


_CUBE_ORACLE = f"""
SELECT r_name, c_mktsegment, COUNT(*) AS n_cust,
       {dec_sum_sql('c_acctbal', 'total_bal')},
       CAST(GROUPING(r_name) * 2 + GROUPING(c_mktsegment) AS INTEGER) AS gmask
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE(r_name, c_mktsegment)
ORDER BY gmask, r_name, c_mktsegment
"""


def q_sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point end-to-end: tables registered as temp views
    (:func:`sources.tables.register_views` — the engine's equivalent of
    the reference's named-workspace tables) and the query written as
    one ``spark.sql`` CTE statement. Same Catalyst plan as the
    DataFrame form — this query witnesses that every capability is
    reachable from plain SQL."""
    from gis_city_county_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(
        """
WITH supp_rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))
              AS DOUBLE) AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_name, revenue
FROM supp_rev
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE revenue > 100000.0
"""
    )


_SQL_API_ORACLE = f"""
WITH supp_rev AS (
  SELECT l_suppkey,
         {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_name, revenue
FROM supp_rev
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE revenue > 100000.0
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — only the two marginal breakdowns
    (per-region, per-segment), skipping the detail cells a CUBE would
    also compute: the Expand operator replicates rows only per
    requested set, so asking for 2 sets costs 2× map output instead of
    CUBE's 4×."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    base = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    mask = (F.grouping("r_name") * 2 + F.grouping("c_mktsegment")).cast("int")
    return (
        base.groupingSets(
            [["r_name"], ["c_mktsegment"]], "r_name", "c_mktsegment"
        )
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dec_sum("c_acctbal", "total_bal"),
            mask.alias("gmask"),
        )
        .orderBy("gmask", "r_name", "c_mktsegment")
    )


_GSETS_ORACLE = f"""
SELECT r_name, c_mktsegment, COUNT(*) AS n_cust,
       {dec_sum_sql('c_acctbal', 'total_bal')},
       CAST(GROUPING(r_name) * 2 + GROUPING(c_mktsegment) AS INTEGER) AS gmask
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment))
ORDER BY gmask, r_name, c_mktsegment
"""


def q_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface in one pass over each customer's
    order history: row_number, lag/lead, running decimal sum,
    percent_rank/cume_dist, and a 3-row moving minimum — all sharing
    one (partition, order) spec, so Catalyst plans a single sort +
    single Window operator (one shuffle on o_custkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(38,10)"))
        .over(wrun)
        .cast("double")
        .alias("run_total"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.min("o_totalprice").over(wmov).alias("mov_min"),
    )


_WINBAT_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS run_total,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd,
       MIN(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS mov_min
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance deciles via ntile(10) over a total order
    (acctbal, custkey tiebreak), rolled up per decile. The global
    window is a single-partition sort — fine for a dimension table;
    for a 100 TB fact column the same report would come from
    approx_percentile boundaries + a bucket join, trading exactness
    for a shuffle-free scan."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return (
        cust.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("c_acctbal").alias("lo_bal"),
            F.max("c_acctbal").alias("hi_bal"),
            dec_sum("c_acctbal", "total_bal"),
        )
        .orderBy("decile")
    )


_NTILE_ORACLE = f"""
SELECT decile, COUNT(*) AS n_cust,
       MIN(c_acctbal) AS lo_bal, MAX(c_acctbal) AS hi_bal,
       {dec_sum_sql('c_acctbal', 'total_bal')}
FROM (
  SELECT c_acctbal,
         NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer
)
GROUP BY decile ORDER BY decile
"""


_BASKET_MINSUP, _BASKET_K = 3, 25


def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 25 most co-purchased part pairs
    (within an order) with exact integer lift —
    ``lift_ppm = c_ab·n_orders·10⁶ div (c_a·c_b)`` (> 10⁶ ⇒ bought
    together more than independence predicts). The within-order pair
    join is bounded by basket size (≈ lines-per-order, single digits),
    never O(parts²); supports below 3 are pruned before the lift math
    and top-k executes as TakeOrderedAndProject."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # four consumers (order census, item counts, both self-join legs):
    # materialize the distinct-basket shuffle once instead of
    # replaying it per reference (guide SS3.3)
    baskets = _materialize_for_multipass(
        li.select("l_orderkey", "l_partkey").distinct()
    )
    n_orders = baskets.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item_cnt = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = baskets.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _BASKET_MINSUP)
    )
    ca = item_cnt.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    cb = item_cnt.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(
                "CAST((CAST(c_ab AS DECIMAL(38,0)) * n_orders * 1000000)"
                " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("c_ab").desc(), "part_a", "part_b")
        .limit(_BASKET_K)
    )


_BASKET_ORACLE = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
item_cnt AS (SELECT l_partkey, COUNT(*) AS c FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS c_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_BASKET_MINSUP}
)
SELECT p.part_a, p.part_b, p.c_ab, ca.c AS c_a, cb.c AS c_b,
       CAST((CAST(p.c_ab AS HUGEINT) * n.n_orders * 1000000)
            // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN item_cnt ca ON ca.l_partkey = p.part_a
JOIN item_cnt cb ON cb.l_partkey = p.part_b
CROSS JOIN n
ORDER BY p.c_ab DESC, p.part_a, p.part_b LIMIT {_BASKET_K}
"""


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan rate for each foreign-key
    edge of the warehouse (lineitem→orders, lineitem→part,
    lineitem→supplier, orders→customer) — the pre-join data-quality
    gate. Each edge is one left-anti join against the (broadcastable)
    distinct key set; exact ppm rates via `div`."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")

    def edge(name, child, fk, parent, pk):
        hit = parent.select(F.col(pk).alias(fk)).distinct().withColumn(
            "__hit", F.lit(1)
        )
        return (
            child.select(F.col(fk))
            .join(hit, fk, "left")
            .agg(
                F.lit(name).alias("edge"),
                F.count(F.lit(1)).alias("n_child"),
                F.count_if(F.col("__hit").isNull()).alias("n_orphans"),
            )
        )

    out = (
        edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionByName(edge("lineitem->part", li, "l_partkey", part, "p_partkey"))
        .unionByName(edge("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"))
        .unionByName(edge("orders->customer", orders, "o_custkey", cust, "c_custkey"))
    )
    return out.select(
        "edge",
        "n_child",
        "n_orphans",
        F.expr("CAST(CAST(n_orphans AS DECIMAL(38,0)) * 1000000 div n_child AS BIGINT)").alias(
            "orphan_ppm"
        ),
    ).orderBy("edge")


_FK_ORACLE = """
WITH edges AS (
  SELECT 'lineitem->orders' AS edge, COUNT(*) AS n_child,
         COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem->part', COUNT(*),
         COUNT(*) FILTER (WHERE p.p_partkey IS NULL)
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'lineitem->supplier', COUNT(*),
         COUNT(*) FILTER (WHERE s.s_suppkey IS NULL)
  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  UNION ALL
  SELECT 'orders->customer', COUNT(*),
         COUNT(*) FILTER (WHERE c.c_custkey IS NULL)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT edge, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CAST(CAST(n_orphans AS HUGEINT) * 1000000 // n_child AS BIGINT) AS orphan_ppm
FROM edges ORDER BY edge
"""


def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT surface: ``parse_json`` the props column into a
    variant once, ``variant_get`` typed paths out — the
    semi-structured path that keeps a binary-encoded document instead
    of reparsing JSON text per access (the open-lakehouse
    semi-structured story). Same aggregation as the JSON twin so the
    two extraction paths are cross-checked against one oracle shape."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_VARIANT_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1 ORDER BY 1
"""


def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered dimension join (operators.scale
    .bloom_prefilter): lineitem is cut to probable members of a
    selective order subset by a 16 KB literal-bitstring Bloom test
    (pure Catalyst exprs, pushable below the join) before the exact
    join — same result as the plain join, a fraction of the shuffle.
    The oracle IS the plain join: false positives cannot survive."""
    from gis_city_county_spark.operators.scale import bloom_prefilter

    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 31 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    pre = bloom_prefilter(li, dim.select("l_orderkey"), "l_orderkey")
    return (
        pre.join(dim, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


_BLOOM_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {dec_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderkey % 31 = 0
GROUP BY 1 ORDER BY 1
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact⋈dim join (operators.scale.salted_join):
    lineitem rows take a deterministic row-hash salt, orders replicate
    ``n_salt``× via an inline explode, and the shuffle key becomes
    (orderkey, salt) — each hot key spreads over 8 reducers instead of
    one straggler. Same rows out as the plain join (each left row
    matches exactly the replica carrying its salt), which is what the
    oracle checks."""
    from gis_city_county_spark.operators.scale import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    dim = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, dim, "l_orderkey", "inner", n_salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


_SALTED_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {dec_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def q_share_of_wallet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per customer ('share of wallet'): each
    customer's total spend, their top supplier, and that supplier's
    exact ppm share — the dependency/concentration scan (a customer
    above ~500000 ppm is single-sourced). Two keyed aggregates and a
    per-customer argmax window; spend sums decimal-exact."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    spend = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).alias("__s")
        )
    )
    # r12: the argmax (s desc, suppkey asc) and the per-customer total
    # are ONE map-side-combinable aggregate — min over (−s…, suppkey)
    # is wrong for decimals, but max over (s, −suppkey) structs picks
    # the same row the row_number window did, without the
    # per-customer sort (guide §2.2 — same shuffle, no sort, and
    # partial aggregation collapses cells map-side).
    top = spend.groupBy("o_custkey").agg(
        F.sum(F.col("__s").cast("decimal(28,10)")).alias("__tot"),
        F.max(
            F.struct(F.col("__s"), (-F.col("l_suppkey")).alias("__negk"))
        ).alias("__m"),
    )
    return top.select(
        "o_custkey",
        (-F.col("__m.__negk")).cast("bigint").alias("top_suppkey"),
        F.expr(
            "CAST((CAST(__m.__s * 10000000000 AS DECIMAL(38,0)) * 1000000)"
            " div CAST(__tot * 10000000000 AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("top_share_ppm"),
    )


_WALLET_ORACLE = """
WITH spend AS (
  SELECT o_custkey, l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT o_custkey, l_suppkey, s,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY s DESC, l_suppkey ASC) AS rn,
         SUM(CAST(s AS DECIMAL(28,10))) OVER (PARTITION BY o_custkey) AS tot
  FROM spend
)
SELECT o_custkey, l_suppkey AS top_suppkey,
       CAST(CAST(s * 10000000000 AS HUGEINT) * 1000000
            // CAST(tot * 10000000000 AS HUGEINT) AS BIGINT) AS top_share_ppm
FROM ranked WHERE rn = 1
"""


def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit on the order-key space: the 20 widest
    missing-id ranges — the completeness check for ingest pipelines
    fed by sequential ids; a sudden wide gap means a dropped extract.

    Scale-safe plan (r3): ``operators.scale.ranged_gaps`` buckets the
    id space by ``key div 8192``, finds gaps inside each bucket with a
    PARTITIONED lead window, and stitches bucket boundaries through a
    bounded per-bucket min/max table — no full-data single-partition
    WindowExec (pinned by test_plan_quality)."""
    from gis_city_county_spark.operators.scale import ranged_gaps

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    gaps = ranged_gaps(orders, "o_orderkey", bucket_width=8192)
    return gaps.select(
        "gap_start",
        "gap_end",
        "gap_len",
    ).orderBy(F.col("gap_len").desc(), F.col("gap_start").asc()).limit(20)


_SEQ_GAPS_ORACLE = """
WITH k AS (SELECT DISTINCT o_orderkey FROM orders),
gaps AS (
  SELECT o_orderkey + 1 AS gap_start,
         next_k - 1 AS gap_end,
         next_k - o_orderkey - 1 AS gap_len
  FROM (SELECT o_orderkey,
               LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS next_k
        FROM k)
  WHERE next_k > o_orderkey + 1
)
SELECT gap_start, gap_end, gap_len
FROM gaps ORDER BY gap_len DESC, gap_start ASC LIMIT 20
"""


def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period rank movement: parts ranked by revenue in
    1995 vs 1996, joined on part, biggest climbers by rank delta
    (ties → lowest part key). Two global rankings + one join — the
    'top movers' BI report, exact integers throughout.

    Scale-safe plan (r3): each year's ranking runs through
    ``operators.scale.ranged_rank`` — range-bucketed parallel
    row_number + driver-bounded prefix offsets — instead of a
    single-partition ``Window.orderBy`` (pinned by
    test_plan_quality). The per-part revenue table is persisted so
    the rank helper's bounded cut/count jobs don't rescan lineitem."""
    from gis_city_county_spark.operators.scale import (
        checkpoint_lazy,
        ranged_rank,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # r12: ONE lineitem scan + one aggregate for both years (guide
    # §2.3 — the old per-year helper scanned and shuffled lineitem
    # twice); each year's per-part sum is a conditional sum, and a
    # part absent from a year drops via the NULL filter, reproducing
    # the year-filtered grouping exactly.
    rev2 = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey")
        .agg(
            *[
                F.sum(
                    F.when(
                        (F.col("l_shipdate") >= f"{y}-01-01")
                        & (F.col("l_shipdate") < f"{y + 1}-01-01"),
                        (
                            F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))
                        ).cast("decimal(38,10)"),
                    )
                ).alias(f"__rev_{y}")
                for y in (1995, 1996)
            ]
        )
        # lazy-checkpointed (NOT .persist()): reused by both year
        # ranks within this invocation; a plan-keyed persist made
        # bench pass 2 reuse pass 1's cache ([8.1, 2.0] driver runs —
        # r12 verdict item 3), hiding the honest cold cost.
        .transform(checkpoint_lazy)
    )

    def year_rank(year: str):
        rev = rev2.filter(F.col(f"__rev_{year}").isNotNull()).select(
            "l_partkey", F.col(f"__rev_{year}").alias("__rev")
        )
        ranked = ranged_rank(
            rev, "__rev", "l_partkey", rank_col=f"rank_{year}", descending=True
        )
        # the operator ranks in BIGINT (no wrap at >2.1B rows); the
        # report casts to the oracle's INTEGER shape
        return ranked.select(
            "l_partkey", F.col(f"rank_{year}").cast("int").alias(f"rank_{year}")
        )

    joined = year_rank("1995").join(year_rank("1996"), "l_partkey")
    return (
        joined.withColumn("rank_delta", F.col("rank_1995") - F.col("rank_1996"))
        .orderBy(F.col("rank_delta").desc(), F.col("l_partkey").asc())
        .limit(20)
    )


_TOP_MOVERS_ORACLE = """
WITH r95 AS (
  SELECT l_partkey,
         ROW_NUMBER() OVER (
           ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,10))) DESC, l_partkey ASC) AS rank_1995
  FROM lineitem
  WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
  GROUP BY l_partkey
),
r96 AS (
  SELECT l_partkey,
         ROW_NUMBER() OVER (
           ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,10))) DESC, l_partkey ASC) AS rank_1996
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(rank_1995 AS INTEGER) AS rank_1995,
       CAST(rank_1996 AS INTEGER) AS rank_1996,
       CAST(rank_1995 - rank_1996 AS INTEGER) AS rank_delta
FROM r95 JOIN r96 USING (l_partkey)
ORDER BY rank_delta DESC, l_partkey ASC LIMIT 20
"""


def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC inventory classification: parts ranked by revenue,
    cumulative revenue share in exact ppm (decimal-windowed cumsum —
    windowed double sums are NOT engine-exact), classed A/B/C at
    70%/90%. Output: per class, part count and revenue share bounds.

    Scale-safe plan (r3): the global cumulative sum runs through
    ``operators.scale.ranged_cumsum`` — per-bucket decimal-exact
    windowed cumsum + driver-bounded (Decimal-exact) bucket prefix
    offsets — replacing both single-partition patterns the r1 version
    had (the global-order running sum AND ``SUM(...) OVER ()``)."""
    from gis_city_county_spark.operators.scale import (
        checkpoint_lazy,
        ranged_cumsum,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).alias("__rev")
        )
        .withColumn("__v", F.col("__rev").cast("decimal(28,10)"))
        # lazy checkpoint, not .persist(): see q_top_movers.
        .transform(checkpoint_lazy)
    )
    ranked = ranged_cumsum(
        rev,
        "__rev",
        "l_partkey",
        "__v",
        cum_col="__cum",
        total_col="__tot",
        descending=True,
    )
    # scale the decimals to exact integers (×10^10) before the ppm
    # division — casting a decimal straight to a big integer would
    # floor away the fraction first
    share_ppm = F.expr(
        "CAST((CAST(__cum * 10000000000 AS DECIMAL(38,0)) * 1000000)"
        " div CAST(__tot * 10000000000 AS DECIMAL(38,0)) AS BIGINT)"
    )
    classed = ranked.withColumn("cum_ppm", share_ppm).withColumn(
        "abc_class",
        F.when(F.col("cum_ppm") <= 700000, "A")
        .when(F.col("cum_ppm") <= 900000, "B")
        .otherwise("C"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("cum_ppm").alias("min_cum_ppm"),
        F.max("cum_ppm").alias("max_cum_ppm"),
    )


_PARETO_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS r
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_partkey, r,
         SUM(CAST(r AS DECIMAL(28,10))) OVER (ORDER BY r DESC, l_partkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(r AS DECIMAL(28,10))) OVER () AS tot
  FROM rev
),
classed AS (
  SELECT CAST(CAST(cum * 10000000000 AS HUGEINT) * 1000000
              // CAST(tot * 10000000000 AS HUGEINT) AS BIGINT) AS cum_ppm
  FROM ranked
)
SELECT CASE WHEN cum_ppm <= 700000 THEN 'A'
            WHEN cum_ppm <= 900000 THEN 'B' ELSE 'C' END AS abc_class,
       COUNT(*) AS n_parts,
       MIN(cum_ppm) AS min_cum_ppm, MAX(cum_ppm) AS max_cum_ppm
FROM classed GROUP BY 1
"""


_PK_CANDIDATES = [
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("lineitem", ["l_orderkey"]),
]


def q_pk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key candidate audit: for each proposed key, row count,
    distinct count, and how many key values collide — the constraint
    checker engines without enforced PKs (Spark included) run before
    trusting a key for joins/merges. One aggregate per candidate,
    unioned; each is map-side combinable."""
    frames = []
    for table, cols in _PK_CANDIDATES:
        df = load_table(spark, sf_dir, table)
        per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
        frames.append(
            per_key.agg(
                F.lit(table + ":" + "+".join(cols)).alias("candidate"),
                F.sum("__c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)).alias(
                    "n_dup_keys"
                ),
                (F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)) == 0).alias(
                    "is_unique"
                ),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _pk_audit_oracle() -> str:
    parts = []
    for table, cols in _PK_CANDIDATES:
        keys = ", ".join(cols)
        name = table + ":" + "+".join(cols)
        parts.append(
            f"""SELECT '{name}' AS candidate,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
       SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0 AS is_unique
FROM (SELECT {keys}, COUNT(*) AS c FROM {table} GROUP BY {keys})"""
        )
    return "\nUNION ALL\n".join(parts)


def q_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured Bloom false-positive rate at the prefilter's operating
    point (2^14 bits, 3 hashes, the %31 order subset as members) —
    exact ppm over non-member candidates, via the relational twin of
    the bitset membership test."""
    from gis_city_county_spark.operators.scale import bloom_fpr_report

    orders = load_table(spark, sf_dir, "orders")
    members = orders.filter(F.col("o_orderkey") % 31 == 0)
    return bloom_fpr_report(
        orders, members, "o_orderkey", n_bits=1 << 14, n_hashes=3
    )


def _bloom_fpr_oracle() -> str:
    from gis_city_county_spark.operators.scale import bloom_fpr_report_sql

    return bloom_fpr_report_sql(
        "SELECT o_orderkey FROM orders",
        "SELECT o_orderkey FROM orders WHERE o_orderkey % 31 = 0",
        "o_orderkey",
        n_bits=1 << 14,
        n_hashes=3,
    )


# Benford expected first-digit frequencies, parts-per-million
# (⌊10⁶·log10(1+1/d)⌉ — literals, so no cross-engine log calls).
_BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
                6: 66947, 7: 57992, 8: 51153, 9: 45757}


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals — the fraud/synthetic-data
    screen: observed first-digit shares (exact integer ppm) against
    the Benford expectation, per digit. The digit comes from the
    integer part's string form (identical formatting on both engines;
    no float→string scientific-notation hazards). One 9-row aggregate;
    the total rides on an unpartitioned window over those 9 rows."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    total = F.sum("n_obs").over(Window.partitionBy())
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
        ),
        F.col("digit"),
    )
    # `div` = exact integral division (twin of DuckDB `//`); decimal
    # `/` would round at scale 6 before the long cast.
    return (
        counts.withColumn("__tot", total)
        .withColumn(
            "obs_ppm",
            F.expr(
                "(CAST(n_obs AS DECIMAL(38,0)) * 1000000) div __tot"
            ).cast("long"),
        )
        .select(
            "digit",
            "n_obs",
            "obs_ppm",
            expected.alias("expected_ppm"),
            (F.col("obs_ppm") - expected).alias("excess_ppm"),
        )
    )


def _benford_oracle() -> str:
    exp_case = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
    )
    return f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit,
         COUNT(*) AS n_obs
  FROM orders GROUP BY 1
),
tot AS (SELECT SUM(n_obs) AS t FROM counts)
SELECT digit, n_obs,
       CAST(CAST(n_obs AS HUGEINT) * 1000000 // t AS BIGINT) AS obs_ppm,
       CAST(CASE digit {exp_case} END AS INTEGER) AS expected_ppm,
       CAST(CAST(n_obs AS HUGEINT) * 1000000 // t
            - CASE digit {exp_case} END AS BIGINT) AS excess_ppm
FROM counts CROSS JOIN tot
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis on the fact table's part key: the 10
    heaviest keys with exact parts-per-million share
    (operators.profile.skew_report) — run before a 100 TB shuffle to
    decide on salting / AQE skew handling. Top-k executes as
    TakeOrderedAndProject (per-partition heaps), never a full sort."""
    from gis_city_county_spark.operators.profile import skew_report

    li = load_table(spark, sf_dir, "lineitem")
    return skew_report(li, "l_partkey", top_k=10)


def _skew_oracle() -> str:
    from gis_city_county_spark.operators.profile import skew_report_sql

    return skew_report_sql("SELECT l_partkey FROM lineitem", "l_partkey", top_k=10)


_SKEW_ORACLE = _skew_oracle()


def q_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out profile of the orders→lineitem join: how many orders
    carry exactly N line items (orders with zero included) — the skew
    read a planner takes before choosing salting/skew-join hints."""
    from gis_city_county_spark.operators.profile import (
        join_fanout_histogram,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return join_fanout_histogram(orders, lineitem, "o_orderkey", "l_orderkey")


def _join_fanout_oracle() -> str:
    from gis_city_county_spark.operators.profile import (
        join_fanout_histogram_sql,
    )

    return join_fanout_histogram_sql(
        "SELECT * FROM orders", "SELECT * FROM lineitem",
        "o_orderkey", "l_orderkey",
    )


def q_share_of_parent(spark, sf_dir):
    """Hierarchical percent-of-parent rollup: each nation's lineitem
    revenue as a share of its region and of the world — exact decimal
    sums closed by single IEEE divides (the dec_sum convention), one
    scan + two bounded rollup joins (broadcast: 25 nations, 5
    regions)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(38,10)")
            ).alias("__rev")
        )
        # r12: `rev` is ≤25 rows but its lineage is the full
        # lineitem 3-join aggregate, and THREE consumers (itself, the
        # region rollup, the grand total) replayed that scan+joins per
        # reference (guide §3.3) — truncate once.
        .localCheckpoint(eager=False)
    )
    region = rev.groupBy("r_name").agg(
        F.sum("__rev").alias("__region_rev")
    )
    total = rev.agg(F.sum("__rev").alias("__total_rev"))
    return (
        rev.join(F.broadcast(region), "r_name")
        .join(F.broadcast(total))
        .select(
            "r_name",
            "n_name",
            F.col("__rev").cast("double").alias("nation_rev"),
            F.col("__region_rev").cast("double").alias("region_rev"),
            (F.col("__rev").cast("double")
             / F.col("__region_rev").cast("double"))
            .alias("share_of_region"),
            (F.col("__rev").cast("double")
             / F.col("__total_rev").cast("double"))
            .alias("share_of_total"),
        )
    )


_SHARE_OF_PARENT_ORACLE = """
WITH rev AS (
  SELECT r_name, n_name,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10)))
           AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
),
reg AS (SELECT r_name, SUM(rev) AS region_rev FROM rev GROUP BY r_name),
tot AS (SELECT SUM(rev) AS total_rev FROM rev)
SELECT rev.r_name, rev.n_name,
       CAST(CAST(rev.rev AS VARCHAR) AS DOUBLE) AS nation_rev,
       CAST(CAST(reg.region_rev AS VARCHAR) AS DOUBLE) AS region_rev,
       CAST(CAST(rev.rev AS VARCHAR) AS DOUBLE)
         / CAST(CAST(reg.region_rev AS VARCHAR) AS DOUBLE)
         AS share_of_region,
       CAST(CAST(rev.rev AS VARCHAR) AS DOUBLE)
         / CAST(CAST(tot.total_rev AS VARCHAR) AS DOUBLE)
         AS share_of_total
FROM rev JOIN reg ON rev.r_name = reg.r_name CROSS JOIN tot
"""


def q_cube_revenue(spark, sf_dir):
    """Full CUBE over (order status, order priority): every subtotal
    combination plus the grand total in ONE pass (Spark expands the
    cube through a single Expand + hash aggregate — four grouping
    sets, one scan, one shuffle), with an explicit grouping-bit id so
    subtotal NULLs are distinguishable from data NULLs.  Exact
    decimal revenue (dec_sum convention)."""
    from gis_city_county_spark.functions.numeric import dec_sum

    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            # grouping() must live inside the agg list (Spark rejects
            # it in a downstream projection).
            (2 * F.grouping("o_orderstatus")
             + F.grouping("o_orderpriority")).cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dec_sum("o_totalprice", "revenue"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
    )


def _cube_revenue_oracle() -> str:
    from gis_city_county_spark.functions.numeric import dec_sum_sql

    return f"""
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority)
            AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {dec_sum_sql("o_totalprice", "revenue")}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""



SPECS = [
    QuerySpec("olap_cube_revenue", q_cube_revenue, _cube_revenue_oracle()),
    QuerySpec("olap_share_of_parent", q_share_of_parent,
              _SHARE_OF_PARENT_ORACLE),
    QuerySpec("olap_pivot_event_matrix", q_pivot_event_matrix, _PIVOT_ORACLE),
    QuerySpec("profile_join_fanout", q_join_fanout, _join_fanout_oracle()),
    QuerySpec("olap_melt_lineitem_metrics", q_melt_lineitem_metrics, _MELT_ORACLE),
    QuerySpec("tpch_q2_min_cost_supplier", q2_min_cost_supplier, _Q2_ORACLE),
    QuerySpec("tpch_q4_order_priority", q4_order_priority, _Q4_ORACLE),
    QuerySpec("tpch_q7_volume_shipping", q7_volume_shipping, _Q7_ORACLE),
    QuerySpec("tpch_q8_market_share", q8_market_share, _Q8_ORACLE),
    QuerySpec("tpch_q9_product_profit", q9_product_profit, _Q9_ORACLE),
    QuerySpec("tpch_q10_returned_items", q10_returned_items, _Q10_ORACLE),
    QuerySpec("tpch_q11_important_stock", q11_important_stock, _Q11_ORACLE),
    QuerySpec("tpch_q12_lateness_classes", q12_lateness_classes, _Q12_ORACLE),
    QuerySpec("tpch_q13_order_counts", q13_order_counts, _Q13_ORACLE),
    QuerySpec("tpch_q14_promo_effect", q14_promo_effect, _Q14_ORACLE),
    QuerySpec("tpch_q15_top_supplier", q15_top_supplier, _Q15_ORACLE),
    QuerySpec("tpch_q16_supplier_counts", q16_supplier_counts, _Q16_ORACLE),
    QuerySpec("tpch_q17_small_qty_revenue", q17_small_qty_revenue, _Q17_ORACLE),
    QuerySpec("tpch_q18_large_orders", q18_large_orders, _Q18_ORACLE),
    QuerySpec("tpch_q19_disjunctive", q19_disjunctive, _Q19_ORACLE),
    QuerySpec("tpch_q20_excess_suppliers", q20_excess_suppliers, _Q20_ORACLE),
    QuerySpec("tpch_q21_waiting_suppliers", q21_waiting_suppliers, _Q21_ORACLE),
    QuerySpec("tpch_q22_idle_customers", q22_idle_customers, _Q22_ORACLE),
    QuerySpec("olap_rollup_region_nation", q_rollup_region_nation, _ROLLUP_ORACLE),
    QuerySpec("olap_cube_region_segment", q_cube_region_segment, _CUBE_ORACLE),
    QuerySpec("olap_grouping_sets", q_grouping_sets, _GSETS_ORACLE),
    QuerySpec("olap_ntile_deciles", q_ntile_deciles, _NTILE_ORACLE),
    QuerySpec("olap_window_battery", q_window_battery, _WINBAT_ORACLE),
    QuerySpec("sql_api_supplier_revenue", q_sql_api_revenue, _SQL_API_ORACLE),
    QuerySpec("olap_setops_customer_activity", q_setops_customer_activity, _SETOPS_ORACLE),
    QuerySpec("olap_distinct_agg", q_distinct_agg, _DISTINCT_ORACLE),
    QuerySpec("olap_percentiles", q_percentiles, _PERCENTILE_ORACLE),
    QuerySpec("func_json_props", q_json_props, _JSON_ORACLE),
    QuerySpec("func_variant_props", q_variant_props, _VARIANT_ORACLE),
    QuerySpec("olap_basket_affinity", q_basket_affinity, _BASKET_ORACLE),
    QuerySpec("gate_fk_orphans", q_fk_orphans, _FK_ORACLE),
    QuerySpec("profile_skew_report", q_skew_report, _SKEW_ORACLE),
    QuerySpec("scale_bloom_prefilter_join", q_bloom_prefilter_join, _BLOOM_ORACLE),
    QuerySpec("scale_salted_join", q_salted_join, _SALTED_ORACLE),
    QuerySpec("gate_benford_audit", q_benford_audit, _benford_oracle()),
    QuerySpec("scale_bloom_fpr", q_bloom_fpr, _bloom_fpr_oracle()),
    QuerySpec("gate_pk_audit", q_pk_audit, _pk_audit_oracle()),
    QuerySpec("olap_pareto_abc", q_pareto_abc, _PARETO_ORACLE),
    QuerySpec("olap_top_movers", q_top_movers, _TOP_MOVERS_ORACLE),
    QuerySpec("gate_sequence_gaps", q_sequence_gaps, _SEQ_GAPS_ORACLE),
    QuerySpec("olap_share_of_wallet", q_share_of_wallet, _WALLET_ORACLE),
]
