"""Deterministic sketch/sample queries: KMV distinct estimation and
hash-Bernoulli sampling (both bit-identical across engines, unlike
HLL / seeded RNG sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.functions.numeric import dec_sum, dec_sum_sql
from gis_city_county_spark.operators.sketch import (
    hash_sample,
    hash_sample_predicate_sql,
    kmv_distinct,
    kmv_distinct_sql,
    kmv_setops,
    kmv_setops_sql,
    weighted_hash_sample,
    weighted_hash_sample_predicate_sql,
)
from gis_city_county_spark.operators.textstats import tokens, tokens_sql
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-priority: KMV (k=64) estimate of distinct customers,
    alongside the exact count so the sketch error is visible."""
    orders = load_table(spark, sf_dir, "orders")
    est = kmv_distinct(orders, ["o_orderpriority"], "o_custkey", k=64)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return est.join(exact, "o_orderpriority")


_KMV_ORACLE = f"""
WITH est AS ({kmv_distinct_sql("SELECT * FROM orders", ["o_orderpriority"], "o_custkey", k=64)}),
exact AS (
  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact
  FROM orders GROUP BY 1
)
SELECT est.*, exact.n_exact FROM est JOIN exact USING (o_orderpriority)
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic order sample rolled up by priority — the
    reproducible-subset pattern (same keys survive on any engine, any
    partitioning; joining tables sampled by the same key stays
    consistent)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        hash_sample(orders, "o_orderkey", 0.10)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum(F.col("o_totalprice"), "total_price"),
        )
    )


_SAMPLE_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {dec_sum_sql("o_totalprice", "total_price")}
FROM orders
WHERE {hash_sample_predicate_sql("o_orderkey", 0.10)}
GROUP BY 1
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic document sample (p = n_chars /
    4000, clamped): longer documents are proportionally more likely to
    survive, membership is still a pure key-hash filter."""
    docs = load_table(spark, sf_dir, "documents")
    kept = weighted_hash_sample(
        docs, "doc_id", F.col("n_chars").cast("double") / F.lit(4000.0)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        dec_sum(F.col("n_chars").cast("double"), "total_chars"),
    )


_WEIGHTED_ORACLE = f"""
SELECT lang, COUNT(*) AS n_docs,
       {dec_sum_sql("CAST(n_chars AS DOUBLE)", "total_chars")}
FROM documents
WHERE {weighted_hash_sample_predicate_sql("doc_id", "CAST(n_chars AS DOUBLE) / 4000.0")}
GROUP BY 1
"""



def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra: estimated union size, Jaccard, and
    intersection of the English vs French token vocabularies from one
    256-hash KMV union sketch (operators.sketch.kmv_setops) — the
    corpus-overlap probe that never materializes either vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("lang") == "en").select(
        F.explode(tokens("text")).alias("token")
    )
    b = docs.filter(F.col("lang") == "fr").select(
        F.explode(tokens("text")).alias("token")
    )
    return kmv_setops(a, b, "token", k=256)


def _setops_side_sql(lang: str) -> str:
    return (
        "SELECT t.token FROM documents, LATERAL UNNEST("
        + tokens_sql("text")
        + f") AS t(token) WHERE lang = '{lang}'"
    )


_SETOPS_ORACLE = kmv_setops_sql(_setops_side_sql("en"), _setops_side_sql("fr"), "token", k=256)


_EXACT_N = 500


def q_exact_n_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT-size uniform sample: the 500 lineitems with
    the smallest md5 of their row identity — layout- and engine-stable
    like hash_sample, but with a guaranteed sample size (rate-based
    sampling only hits N in expectation). Executes as
    TakeOrderedAndProject over the hash projection — per-partition
    heaps, no global sort — then a summary aggregation.

    The hash covers every output-relevant column ((orderkey,
    linenumber) is NOT unique in the synthetic data): rows tied at the
    N-boundary are then value-identical, so any boundary choice yields
    the same aggregate. The price routes through DECIMAL(18,2) for an
    engine-identical string form."""
    from gis_city_county_spark.functions.numeric import dec_sum

    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.md5(
            F.concat_ws(
                ":",
                F.col("l_orderkey"),
                F.col("l_linenumber"),
                F.col("l_returnflag"),
                F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
            )
        ).alias("__h"),
    )
    sample = keyed.orderBy("__h").limit(_EXACT_N)
    return (
        sample.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dec_sum("l_extendedprice", "sample_revenue"),
        )
        .orderBy("l_returnflag")
    )


def _exact_n_oracle() -> str:
    from gis_city_county_spark.functions.numeric import dec_sum_sql

    return f"""
WITH sample AS (
  SELECT l_returnflag, l_extendedprice
  FROM lineitem
  ORDER BY md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)
               || ':' || l_returnflag
               || ':' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR))
  LIMIT {_EXACT_N}
)
SELECT l_returnflag, COUNT(*) AS n_sampled,
       {dec_sum_sql("l_extendedprice", "sample_revenue")}
FROM sample GROUP BY 1 ORDER BY 1
"""


_EXACT_N_ORACLE = _exact_n_oracle()


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via bitmap aggregation
    (bit_or over 63-bit id words + popcount sum), with the shuffle
    -distinct countDistinct alongside proving exactness."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.sketch import bitmap_distinct

    ev = load_table(spark, sf_dir, "events")
    bm = bitmap_distinct(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return bm.join(exact, "event_type")


def _bitmap_oracle() -> str:
    from gis_city_county_spark.operators.sketch import bitmap_distinct_sql

    return f"""
WITH bm AS ({bitmap_distinct_sql("SELECT event_type, user_id FROM events", ["event_type"], "user_id")}),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT bm.*, exact.n_exact FROM bm JOIN exact USING (event_type)
"""


def q_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream: top-20 tokens' exact
    vs sketch-estimated frequencies with the (always ≥0) overcount —
    the bounded-memory frequency structure, error-audited."""
    from gis_city_county_spark.operators.sketch import countmin_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return countmin_heavy_hitters(toks, "tok", width=1 << 10, depth=4, k=20)


def _countmin_oracle() -> str:
    from gis_city_county_spark.operators.sketch import countmin_heavy_hitters_sql

    src = (
        f"SELECT t.tok FROM (SELECT {tokens_sql('text')} AS tl FROM documents) s,"
        " LATERAL UNNEST(s.tl) AS t(tok)"
    )
    return countmin_heavy_hitters_sql(src, "tok", "tok", width=1 << 10, depth=4, k=20)


def q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-priority: deterministic HyperLogLog (p=8) raw
    estimate of distinct customers next to the exact count — the
    bounded-memory (m=256 registers/group) structure a 100 TB
    distinct-count rollup uses, made engine-reproducible by md5
    hashing and an exact integer register sum."""
    from gis_city_county_spark.operators.sketch import hll_distinct

    orders = load_table(spark, sf_dir, "orders")
    est = hll_distinct(orders, ["o_orderpriority"], "o_custkey", p=8)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return est.join(exact, "o_orderpriority")


def _hll_oracle() -> str:
    from gis_city_county_spark.operators.sketch import hll_distinct_sql

    return f"""
WITH est AS ({hll_distinct_sql("SELECT * FROM orders", ["o_orderpriority"], "o_custkey", p=8)}),
exact AS (
  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact
  FROM orders GROUP BY 1
)
SELECT est.*, exact.n_exact FROM est JOIN exact USING (o_orderpriority)
"""


def q_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per event type, build daily HLL
    registers (p=8) over user_id, then MERGE the per-day sketches
    into the period estimate with a register-wise MAX — the
    re-aggregatable property a 100 TB daily-build pipeline relies on
    (the rollup touches KB-scale registers, never the raw events).
    The exact distinct count rides along as the self-audit column."""
    from gis_city_county_spark.operators.sketch import hll_merge_rollup

    events = load_table(spark, sf_dir, "events")
    return hll_merge_rollup(
        events, ["event_type"], F.to_date("ts"), "user_id", p=8
    )


def _hll_rollup_oracle() -> str:
    from gis_city_county_spark.operators.sketch import hll_merge_rollup_sql

    return hll_merge_rollup_sql(
        "SELECT * FROM events", ["event_type"], "CAST(ts AS DATE)",
        "user_id", p=8,
    )


_DELTA_SPLIT = "2024-01-16 00:00:00"


def q_countmin_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity drift between the first and second half of
    the event horizon, answered from two count-min sketches (same
    seeds, directly comparable cells) with the exact per-period
    counts riding along as the audit — the bounded-memory
    "what changed since yesterday" monitor."""
    from gis_city_county_spark.operators.sketch import countmin_delta

    events = load_table(spark, sf_dir, "events")
    t = F.lit(_DELTA_SPLIT).cast("timestamp")
    return countmin_delta(
        events.filter(F.col("ts") < t),
        events.filter(F.col("ts") >= t),
        "user_id",
        width=1 << 10,
        depth=4,
        k=20,
    )


def _countmin_delta_oracle() -> str:
    from gis_city_county_spark.operators.sketch import countmin_delta_sql

    return countmin_delta_sql(
        f"SELECT * FROM events WHERE ts < TIMESTAMP '{_DELTA_SPLIT}'",
        f"SELECT * FROM events WHERE ts >= TIMESTAMP '{_DELTA_SPLIT}'",
        "user_id",
        "user_id",
        width=1 << 10,
        depth=4,
        k=20,
    )


def q_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set-overlap between two overlapping customer populations
    (mod-3 vs mod-2 order filters): register-max union +
    inclusion-exclusion intersection estimate, exact counts riding as
    the audit."""
    from gis_city_county_spark.operators.sketch import hll_intersection

    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_custkey") % 3 != 0).select("o_custkey")
    b = o.filter(F.col("o_custkey") % 2 == 0).select("o_custkey")
    return hll_intersection(a, b, "o_custkey")


def _hll_intersection_oracle() -> str:
    from gis_city_county_spark.operators.sketch import hll_intersection_sql

    return hll_intersection_sql(
        "SELECT o_custkey FROM orders WHERE o_custkey % 3 != 0",
        "SELECT o_custkey FROM orders WHERE o_custkey % 2 = 0",
        "o_custkey",
    )


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join-size (F2) estimate of the event user-id distribution
    from 32 AMS sign counters — the bounded-memory skew monitor a
    planner consults before shuffling a 100 TB equi-join on the key;
    exact F2 rides as the audit."""
    from gis_city_county_spark.operators.sketch import ams_f2

    events = load_table(spark, sf_dir, "events")
    return ams_f2(events, "user_id", n_seeds=32)


def _ams_f2_oracle() -> str:
    from gis_city_county_spark.operators.sketch import ams_f2_sql

    return ams_f2_sql("SELECT * FROM events", "user_id", n_seeds=32)


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory p25/p50/p75/p90/p99 brackets of order totals
    from a 1024-bin fixed-width histogram — the deterministic,
    mergeable alternative to approxQuantile."""
    from gis_city_county_spark.operators.sketch import histogram_quantiles

    orders = load_table(spark, sf_dir, "orders")
    return histogram_quantiles(orders, "o_totalprice")


def _histogram_quantiles_oracle() -> str:
    from gis_city_county_spark.operators.sketch import (
        histogram_quantiles_sql,
    )

    return histogram_quantiles_sql("SELECT * FROM orders", "o_totalprice")


SPECS = [
    QuerySpec("sketch_histogram_quantiles", q_histogram_quantiles,
              _histogram_quantiles_oracle()),
    QuerySpec("sketch_countmin_heavy_hitters", q_countmin_tokens, _countmin_oracle()),
    QuerySpec("sketch_hll_distinct", q_hll, _hll_oracle()),
    QuerySpec("sketch_hll_merge_rollup", q_hll_merge_rollup, _hll_rollup_oracle()),
    QuerySpec("sketch_hll_intersection", q_hll_intersection,
              _hll_intersection_oracle()),
    QuerySpec("sketch_countmin_delta", q_countmin_delta, _countmin_delta_oracle()),
    QuerySpec("sketch_kmv_distinct", q_kmv, _KMV_ORACLE),
    QuerySpec("olap_bitmap_distinct", q_bitmap_distinct, _bitmap_oracle()),
    QuerySpec("sketch_exact_n_sample", q_exact_n_sample, _EXACT_N_ORACLE),
    QuerySpec("sketch_kmv_setops", q_kmv_setops, _SETOPS_ORACLE),
    QuerySpec("sketch_hash_sample", q_hash_sample, _SAMPLE_ORACLE),
    QuerySpec("sketch_weighted_sample", q_weighted_sample, _WEIGHTED_ORACLE),
    QuerySpec("sketch_ams_f2", q_ams_f2, _ams_f2_oracle()),
]
