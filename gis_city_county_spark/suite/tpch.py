"""Core OLAP query capability (TPC-H-shaped) over the synthetic warehouse.

The reference has no query language — but "same query capabilities"
on non-GIS data means the standard relational surface: multi-key
aggregation, multi-way joins, selective filters, top-k, windows
(SURVEY.md §2.10 / §7 phase 2). These queries double as the benchmark
headliners; each is written so Catalyst produces the plan we want at
scale:

- filters sit directly on the scan (parquet pushdown),
- only needed columns are selected (pruning via projection),
- small dimensions join via broadcast (no shuffle),
- aggregates are partial-aggregated map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gis_city_county_spark.functions.numeric import dec_avg, dec_avg_sql, dec_sum, dec_sum_sql
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-aggregate with 8 aggregates.

    One shuffle on a 6-value grouping key; everything else is map-side
    (partial agg + whole-stage codegen over the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dec_sum_sql('l_quantity', 'sum_qty')},
       {dec_sum_sql('l_extendedprice', 'sum_base_price')},
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {dec_avg_sql('l_quantity', 'avg_qty')},
       {dec_avg_sql('l_extendedprice', 'avg_price')},
       {dec_avg_sql('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10.

    customer is small → broadcast into orders; the orders↔lineitem
    join shuffles on orderkey (both sides pre-filtered at the scan)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                F.col("o_custkey") == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_ORACLE = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where supplier and customer must be
    in the same nation. All dimensions broadcast; the only shuffle is
    the final group-by on nation name."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA").select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_Q5_ORACLE = f"""
SELECT n_name,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + selective filter + single aggregate.
    The whole predicate pushes to the parquet reader; no shuffle at
    all (single-row global agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


_Q6_ORACLE = f"""
SELECT {dec_sum_sql('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — the canonical window
    top-k. One shuffle on the partition key; rank + filter happen
    within partitions (no second shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) t
WHERE rk <= 3
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per supplier over ship date (cumulative window
    frame). Decimal math keeps the running values exactly comparable."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        li.withColumn(
            "running_price",
            F.sum(F.col("l_extendedprice").cast("decimal(38,10)")).over(w).cast("double"),
        )
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            "running_price",
        )
    )


_RUNNING_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10)))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
         AS running_price
FROM lineitem
"""


SPECS = [
    QuerySpec("tpch_q1_pricing_summary", q_pricing_summary, _Q1_ORACLE),
    QuerySpec("tpch_q3_shipping_priority", q_shipping_priority, _Q3_ORACLE),
    QuerySpec("tpch_q5_local_supplier_volume", q_local_supplier_volume, _Q5_ORACLE),
    QuerySpec("tpch_q6_revenue_forecast", q_revenue_forecast, _Q6_ORACLE),
    QuerySpec("window_topk_per_group", q_topk_per_group, _TOPK_ORACLE),
    QuerySpec("window_running_total", q_running_total, _RUNNING_ORACLE),
]
