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


# ----------------------------------------------------- z-order layout


def _overlap_fraction(stats, x_col, x_box, y_col, y_box):
    """Fraction of files whose [min,max] box intersects the query box
    — the files a stats-based reader must open."""
    hit = 0
    for s in stats:
        if s["min"][x_col] is None:
            hit += 1
            continue
        x_miss = s["max"][x_col] < x_box[0] or s["min"][x_col] > x_box[1]
        y_miss = s["max"][y_col] < y_box[0] or s["min"][y_col] > y_box[1]
        if not (x_miss or y_miss):
            hit += 1
    return hit / len(stats)


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Files written in Z-key ranges form tight boxes in BOTH
    dimensions, so a 2-d box query overlaps far fewer files than under
    a single-column sort (tight in one dimension, covering the full
    range of the other)."""
    from gis_city_county_spark.sources.layout import (
        file_minmax_stats,
        quantize,
        write_zordered,
        zorder_key,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
         .cast("long").alias("o_day"),
    )
    hi_cust = orders.agg(F.max("o_custkey")).collect()[0][0]
    hi_day = orders.agg(F.max("o_day")).collect()[0][0]

    z = zorder_key(
        quantize("o_custkey", 1, int(hi_cust), 8),
        quantize("o_day", 0, int(hi_day), 8),
        bits=8,
    )
    z_dir = str(tmp_path / "orders_z")
    write_zordered(orders, z_dir, z, n_files=128)

    lin_dir = str(tmp_path / "orders_linear")
    write_zordered(orders, lin_dir, F.col("o_custkey"), n_files=128)

    cols = ["o_custkey", "o_day"]
    z_stats = file_minmax_stats(z_dir, cols)
    lin_stats = file_minmax_stats(lin_dir, cols)
    assert len(z_stats) >= 64 and len(lin_stats) >= 64

    # 10%-wide predicates in the middle of each dimension.
    x_all = (0, int(hi_cust))
    y_all = (0, int(hi_day))
    x_box = (int(hi_cust * 0.45), int(hi_cust * 0.55))
    y_box = (int(hi_day * 0.45), int(hi_day * 0.55))

    # The defining property: a sorted layout prunes its sort dimension
    # perfectly and the other one not at all (every file spans the full
    # date range). The Z layout must prune BOTH dimensions, so its
    # worst single-dimension overlap stays bounded while linear's is 1.
    z_worst = max(
        _overlap_fraction(z_stats, "o_custkey", x_box, "o_day", y_all),
        _overlap_fraction(z_stats, "o_custkey", x_all, "o_day", y_box),
    )
    lin_worst = max(
        _overlap_fraction(lin_stats, "o_custkey", x_box, "o_day", y_all),
        _overlap_fraction(lin_stats, "o_custkey", x_all, "o_day", y_box),
    )
    assert lin_worst >= 0.9
    assert z_worst <= 0.5

    # And the 2-d box query must stay well below full-scan territory.
    z_frac = _overlap_fraction(z_stats, "o_custkey", x_box, "o_day", y_box)
    assert z_frac <= 0.2

    # Correctness: the clustered copy still holds exactly the same rows.
    assert (
        spark.read.parquet(z_dir).count()
        == orders.count()
    )


def test_compact_files_reduces_file_count(spark, tmp_path):
    from gis_city_county_spark.sources.layout import compact_files

    src = str(tmp_path / "small")
    dest = str(tmp_path / "compact")
    df = spark.range(50_000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(src)

    import glob

    n_small = len(glob.glob(f"{src}/part-*.parquet"))
    assert n_small == 40
    n_out = compact_files(spark, src, dest, target_bytes=64 * 1024 * 1024)
    n_files = len(glob.glob(f"{dest}/part-*.parquet"))
    assert n_files == n_out <= 2
    back = spark.read.parquet(dest)
    assert back.count() == 50_000
    assert back.agg({"v": "sum"}).collect()[0][0] == df.agg({"v": "sum"}).collect()[0][0]


def test_overwrite_partitions_is_selective(spark, sf_dir, tmp_path):
    from gis_city_county_spark.sources.layout import (
        overwrite_partitions,
        read_partitioned,
        write_partitioned,
    )

    path = str(tmp_path / "orders_dyn")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderpriority"])
    before = read_partitioned(spark, path)
    n_total = before.count()
    n_urgent = before.filter(F.col("o_orderpriority") == "1-URGENT").count()

    # replace ONLY the 1-URGENT partition with a reduced version
    replacement = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .filter(F.col("o_orderkey") % 2 == 0)
    )
    n_replacement = replacement.count()
    overwrite_partitions(replacement, path, ["o_orderpriority"])

    after = read_partitioned(spark, path)
    # untouched partitions keep every row; only 1-URGENT shrank
    assert after.filter(F.col("o_orderpriority") != "1-URGENT").count() == (
        n_total - n_urgent
    )
    assert after.filter(F.col("o_orderpriority") == "1-URGENT").count() == n_replacement
    # the static default would have truncated the sibling partitions
    assert after.count() == n_total - n_urgent + n_replacement


def test_ivf_index_partition_pruning(spark, sf_dir, tmp_path):
    """The persisted IVF index must turn probe routing into a literal
    cid partition filter: only the probed list directories are
    scanned, and results equal the in-memory IVF path exactly."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.similarity import (
        build_ivf_index,
        ivf_ann_topk,
        ivf_index_topk,
    )
    from gis_city_county_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, "vec_id", "embedding", path, nlist=32)

    pred = F.col("__id") % 50 == 0
    out = ivf_index_topk(spark, path, "vec_id", "embedding", pred, k=5, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side scan carries the cid partition filter
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters"):][:400]
    assert "cid" in seg

    mem = ivf_ann_topk(emb, "vec_id", "embedding", pred, k=5, nlist=32, nprobe=4)
    key = lambda r: (r["probe_id"], r["rank"])
    got = sorted(
        [(r["probe_id"], r["rank"], r["neighbor_id"]) for r in out.collect()]
    )
    want = sorted(
        [(r["probe_id"], r["rank"], r["neighbor_id"]) for r in mem.collect()]
    )
    assert got == want
