"""Skew helpers: salted join / two-phase distinct must be result-
identical to their plain forms (the only difference is plan shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gis_city_county_spark.operators.scale import salted_join, two_phase_count_distinct
from gis_city_county_spark.sources.tables import load_table

pytestmark = pytest.mark.fast


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


def test_two_phase_count_distinct_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n_distinct"))
    )
    two_phase = two_phase_count_distinct(li, "l_returnflag", "l_orderkey")
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


def test_ranged_rank_matches_global_window_including_nulls(spark):
    """Two-phase ranged_rank must exactly reproduce the single-window
    global row_number — including NULL primaries (desc → NULLS LAST,
    asc → NULLS FIRST) and ties broken by the tiebreak column."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import ranged_rank

    vals = [5.0, 3.0, None, 8.0, 1.0, None, 7.0, 2.0, 6.0, 4.0] * 5
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v double"
    )
    for descending in (True, False):
        got = {
            r["k"]: int(r["rnk"])
            for r in ranged_rank(
                df, "v", "k", rank_col="rnk", descending=descending, n_ranges=4
            ).collect()
        }
        order = F.col("v").desc() if descending else F.col("v").asc()
        w = Window.orderBy(order, F.col("k").asc())
        want = {
            r["k"]: int(r["rnk"])
            for r in df.withColumn("rnk", F.row_number().over(w)).collect()
        }
        assert got == want


def test_ranged_cumsum_matches_global_window(spark):
    from decimal import Decimal

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import ranged_cumsum

    df = spark.createDataFrame(
        [(i, Decimal(v)) for i, v in enumerate([7, 1, 5, 3, 9, 2, 8, 4, 6, 0] * 3)],
        "k long, v decimal(28,10)",
    )
    got = {
        r["k"]: (r["cum"], r["total"])
        for r in ranged_cumsum(
            df, "v", "k", "v", cum_col="cum", total_col="total",
            descending=True, n_ranges=4,
        ).collect()
    }
    w = (
        Window.orderBy(F.col("v").desc(), F.col("k").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = df.withColumn("cum", F.sum("v").over(w)).withColumn(
        "total", F.sum("v").over(Window.partitionBy())
    )
    want = {r["k"]: (r["cum"], r["total"]) for r in ref.collect()}
    assert got == want


def test_ranged_gaps_matches_global_lead(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import ranged_gaps

    keys = [1, 2, 3, 7, 8, 20, 21, 22, 40, 9000, 9001, 9005, 17000]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in ranged_gaps(df, "k", bucket_width=16).collect()
    )
    w = Window.orderBy("k")
    ref = (
        df.withColumn("nxt", F.lead("k").over(w))
        .filter(F.col("nxt") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("s"),
            (F.col("nxt") - 1).alias("e"),
            (F.col("nxt") - F.col("k") - 1).alias("l"),
        )
    )
    want = sorted((r["s"], r["e"], r["l"]) for r in ref.collect())
    assert got == want


def test_ranged_cumsum_handles_nondecimal_sums(spark):
    """Prefix offsets must follow the sum's type — the first version
    shipped Decimal offsets into a bigint column and crashed on any
    non-decimal value_col (r3 review finding)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import ranged_cumsum

    for typ, vals in [("long", [7, 1, 5, 3, 9, 2, 8, 4, 6, 0]),
                      ("double", [1.5, 2.5, 0.5, 3.0])]:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], f"k long, v {typ}"
        )
        out = ranged_cumsum(
            df, "v", "k", "v", cum_col="cum", total_col="tot", n_ranges=3
        )
        w = (
            Window.orderBy(F.col("v").desc(), F.col("k").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ref = df.withColumn("cum", F.sum("v").over(w)).withColumn(
            "tot", F.sum("v").over(Window.partitionBy())
        )
        got = {r["k"]: (r["cum"], r["tot"]) for r in out.collect()}
        want = {r["k"]: (r["cum"], r["tot"]) for r in ref.collect()}
        assert got == want, typ


def test_ranged_rank_routes_nan_like_the_global_window(spark):
    """NaN primaries: Spark sorts NaN greater than every number (desc
    → first, asc → last-before-nothing; NULLs still first/last per
    direction). The bucket assignment must agree in BOTH directions —
    the asc path used to drop NaN into bucket 0 (ADVICE r3)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import ranged_rank

    nan = float("nan")
    vals = [5.0, nan, 3.0, None, 8.0, 1.0, nan, None, 7.0, 2.0] * 4
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v double"
    )
    for descending in (True, False):
        got = {
            r["k"]: int(r["rnk"])
            for r in ranged_rank(
                df, "v", "k", rank_col="rnk", descending=descending, n_ranges=4
            ).collect()
        }
        order = F.col("v").desc() if descending else F.col("v").asc()
        w = Window.orderBy(order, F.col("k").asc())
        want = {
            r["k"]: int(r["rnk"])
            for r in df.withColumn("rnk", F.row_number().over(w)).collect()
        }
        assert got == want, f"descending={descending}"


def test_ranged_multipass_truncates_expensive_lineage_only(spark, sf_dir):
    """ranged_rank/cumsum evaluate their input in three jobs; a
    join/agg input must be localCheckpoint-truncated once (plan shows
    an RDD scan), while a plain scan+filter input must NOT pay a
    checkpoint (pushdown survives)."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )
    from gis_city_county_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cheap = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 10)
    assert _materialize_for_multipass(cheap) is cheap

    expensive = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    )
    out = _materialize_for_multipass(expensive)
    assert out is not expensive
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan


def test_scaling_probe_artifact_has_no_super_linear_query():
    """Gate on the scaling-probe artifact (``python scaling_probe.py``
    writes it): every probed query's wall-clock at factor× data must
    stay within SLACK × linear — a super-linear entry means a hidden
    all-pairs or global-sort term that 100 TB would expose.  Skips
    when the artifact hasn't been generated on this checkout."""
    import json
    from pathlib import Path

    import pytest

    path = Path(__file__).resolve().parent.parent / "BENCH_SCALING.json"
    if not path.exists():
        pytest.skip("run `python scaling_probe.py` to generate BENCH_SCALING.json")
    art = json.loads(path.read_text())
    assert art["factor"] >= 4, "probe factor too small to expose scaling"
    offenders = {
        n: r["x_linear"]
        for n, r in art["queries"].items()
        if r["super_linear"]
    }
    assert not offenders, f"super-linear queries at {art['factor']}x: {offenders}"
    assert art["super_linear"] == sorted(offenders)


def test_iterative_ops_use_reliable_checkpoint_when_configured(spark, tmp_path):
    """With a session checkpoint dir set (the one-call cluster opt-in),
    the iterative operators must (a) produce identical results and
    (b) actually write reliable checkpoints to the dir — the
    executor-loss-durable replacement for localCheckpoint."""
    import os

    from gis_city_county_spark.operators.dedup import connected_components
    from gis_city_county_spark.operators.graph import kcore

    nodes = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(7)] + [(9, 10)], "a_id long, b_id long"
    )
    und = [(i, i + 1) for i in range(6)] + [(0, 2), (1, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )

    plain_cc = sorted(
        (r["doc_id"], r["component"], r["is_keeper"])
        for r in connected_components(nodes, pairs, "doc_id").collect()
    )
    plain_core = sorted(
        (r["node"], r["deg"]) for r in kcore(edges, k=2, rounds=8).collect()
    )

    ckpt = str(tmp_path / "reliable")
    sc = spark.sparkContext
    sc.setCheckpointDir(ckpt)
    try:
        durable_cc = sorted(
            (r["doc_id"], r["component"], r["is_keeper"])
            for r in connected_components(nodes, pairs, "doc_id").collect()
        )
        durable_core = sorted(
            (r["node"], r["deg"]) for r in kcore(edges, k=2, rounds=8).collect()
        )
        assert durable_cc == plain_cc
        assert durable_core == plain_core
        written = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckpt)
            for f in fs
        ]
        assert written, "no reliable checkpoint files were written"
    finally:
        # unset so the shared session doesn't silently slow every
        # later test with durable checkpoints
        jsc = sc._jsc.sc()
        getattr(jsc, "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_ranged_rank_cumsum_matches_both_single_windows(spark):
    """r12: the fused rank+cumsum pass must exactly reproduce BOTH the
    single-window global row_number and the single-window running sum
    (ties by tiebreak, NULL values skipped by the sum), in one
    two-phase plan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.scale import ranged_rank_cumsum

    rows = [
        (i, v, lab)
        for i, (v, lab) in enumerate(
            [(5.0, 1), (3.0, 0), (8.0, None), (1.0, 1), (7.0, 1),
             (2.0, 0), (6.0, None), (4.0, 1), (5.0, 0), (3.0, 1)] * 5
        )
    ]
    df = spark.createDataFrame(rows, "k long, v double, lab bigint")
    for descending in (True, False):
        got = {
            r["k"]: (int(r["rnk"]), None if r["cum"] is None else int(r["cum"]))
            for r in ranged_rank_cumsum(
                df, "v", "k", "lab",
                rank_col="rnk", cum_col="cum",
                descending=descending, n_ranges=4,
            ).collect()
        }
        order = F.col("v").desc() if descending else F.col("v").asc()
        w = Window.orderBy(order, F.col("k").asc())
        want = {
            r["k"]: (int(r["rnk"]), None if r["cum"] is None else int(r["cum"]))
            for r in df.withColumn("rnk", F.row_number().over(w))
            .withColumn(
                "cum",
                F.sum("lab").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .collect()
        }
        assert got == want
