"""Layout operators must actually change the plan: partition pruning
engages on partitioned data, co-bucketed joins plan without
exchanges, bucketed aggregation skips its shuffle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gis_city_county_spark.sources.layout import (
    co_bucketed_join,
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from gis_city_county_spark.sources.tables import load_table


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "orders_by_priority")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderpriority"])
    return path


def test_partitioned_write_roundtrip(spark, sf_dir, part_dir):
    orders = load_table(spark, sf_dir, "orders")
    back = read_partitioned(spark, part_dir)
    assert back.count() == orders.count()
    # one directory per priority value
    dirs = [d for d in os.listdir(part_dir) if d.startswith("o_orderpriority=")]
    assert len(dirs) == orders.select("o_orderpriority").distinct().count()


def test_partition_pruning_engages(spark, part_dir):
    pruned = read_partitioned(spark, part_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = _executed(pruned)
    assert "PartitionFilters" in plan
    # the partition predicate must be IN the partition filters, not a
    # post-scan Filter over all files
    seg = plan[plan.index("PartitionFilters"):]
    assert "o_orderpriority" in seg[: seg.index("]") + 1]


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "orders_b", str(base / "orders_b"), ["o_custkey"], 8)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        str(base / "customer_b"),
        ["o_custkey"],
        8,
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_co_bucketed_join_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_bucketed_join(spark, left, right, ["o_custkey"])
        plan = _executed(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    expected = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    ).count()
    assert co_bucketed_join(spark, left, right, ["o_custkey"]).count() == expected
