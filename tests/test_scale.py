"""Skew helpers: salted join / two-phase distinct must be result-
identical to their plain forms (the only difference is plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gis_city_county_spark.operators.scale import salted_count_distinct, salted_join
from gis_city_county_spark.sources.tables import load_table


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_salted_inner_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", n_salt=8)
    cols = ["l_orderkey", "l_quantity", "o_orderpriority"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    # restrict the right side so some left rows have no match
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    plain = li.join(orders, "l_orderkey", "left")
    salted = salted_join(li, orders, "l_orderkey", how="left", n_salt=8)
    cols = ["l_orderkey", "l_linenumber", "o_orderpriority"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_count_distinct_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n_distinct"))
    )
    two_phase = salted_count_distinct(li, "l_returnflag", "l_orderkey")
    cols = ["l_returnflag", "n_distinct"]
    assert _sorted_rows(two_phase, cols) == _sorted_rows(plain, cols)


def test_bloom_prefilter_no_false_negatives_and_selective(spark, sf_dir):
    from gis_city_county_spark.operators.scale import bloom_prefilter

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # selective dimension side: 1-in-31 orders
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 31 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    pre = bloom_prefilter(li, dim, "l_orderkey")
    # exactness through the follow-up join: identical result sets
    plain = li.join(dim, "l_orderkey")
    filtered = pre.join(dim, "l_orderkey")
    cols = ["l_orderkey", "l_quantity"]
    assert _sorted_rows(filtered, cols) == _sorted_rows(plain, cols)
    # the prefilter must actually prune (few false positives)
    n_all, n_pre, n_true = li.count(), pre.count(), plain.count()
    assert n_pre < n_all * 0.2
    assert n_pre >= n_true


def test_bloom_prefilter_predicate_is_jvm_side(spark, sf_dir):
    from gis_city_county_spark.operators.scale import bloom_prefilter

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 31 == 0
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    plan = bloom_prefilter(li, dim, "l_orderkey")._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan  # pure Catalyst expressions


def test_bruteforce_probe_guards_fail_loud(spark, sf_dir):
    """cosine_topk / fuzzy_lookup are |corpus|x|probes| brute force;
    the default max_probes guard must fail loudly over the threshold
    (pointing at the bucketed scale path) and stay silent under it or
    when overridden."""
    import pytest

    from gis_city_county_spark.operators.search import fuzzy_lookup
    from gis_city_county_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        cosine_topk(emb, emb, "vec_id", "embedding", k=2, max_probes=10)
    # under the threshold and explicit override both pass
    assert cosine_topk(emb, emb.limit(5), "vec_id", "embedding", k=2).count() > 0
    assert (
        cosine_topk(emb, emb, "vec_id", "embedding", k=2, max_probes=None).count()
        > 0
    )

    part = load_table(spark, sf_dir, "part").limit(20).select("p_partkey", "p_name")
    with pytest.raises(ValueError, match="fuzzy_join_blocked"):
        fuzzy_lookup(part, part, "p_partkey", "p_name", k=2, max_probes=10)
    assert fuzzy_lookup(part, part.limit(5), "p_partkey", "p_name", k=2).count() > 0
