"""CDC / mutation queries (operators.cdc): MERGE-style upsert over
orders, type-2 history from the events log, and the release-diff of
two document-table versions (reference ``quality_check.py`` sketch).

The change sets / second snapshots are derived deterministically from
the warehouse tables themselves (mod-partitioned by key) so the same
construction runs identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.cdc import (
    merge_upsert,
    merge_upsert_sql,
    scd2_history,
    scd2_history_sql,
    snapshot_diff,
    snapshot_diff_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec

# ------------------------------------------------------------- merge upsert

_ORD_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def _orders_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(*_ORD_COLS)


def _orders_changes(base: DataFrame) -> DataFrame:
    """Deterministic change set: key%10==3 → price uplift (update),
    key%10==7 → delete, key%10==1 → re-keyed insert."""
    k = F.col("o_orderkey")
    upd = base.filter(k % 10 == 3).withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(1.1)
    ).withColumn("op", F.lit("U"))
    dels = base.filter(k % 10 == 7).withColumn("op", F.lit("D"))
    ins = (
        base.filter(k % 10 == 1)
        .withColumn("o_orderkey", k + F.lit(1_000_000_000))
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("op", F.lit("I"))
    )
    return upd.unionByName(dels).unionByName(ins)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO shape: apply an upsert/delete change set to orders
    by row identity (the reference's update-by-OID re-expressed
    relationally; SURVEY §1 row identity)."""
    base = _orders_base(spark, sf_dir)
    return merge_upsert(base, _orders_changes(base), ["o_orderkey"])


_ORD_BASE_SQL = f"SELECT {', '.join(_ORD_COLS)} FROM orders"
_ORD_CHANGES_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
       'U' AS op FROM ({_ORD_BASE_SQL}) WHERE o_orderkey % 10 = 3
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D' AS op
FROM ({_ORD_BASE_SQL}) WHERE o_orderkey % 10 = 7
UNION ALL
SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice, 'I' AS op
FROM ({_ORD_BASE_SQL}) WHERE o_orderkey % 10 = 1
"""
_MERGE_ORACLE = merge_upsert_sql(
    _ORD_BASE_SQL, _ORD_CHANGES_SQL, ["o_orderkey"], _ORD_COLS
)

# ------------------------------------------------------------- SCD2 history

# Micros-floored events timestamps (see sources.tables._load_events).
_EV_SQL = (
    "SELECT event_id, user_id, event_type, make_timestamp(epoch_us(ts)) AS ts "
    "FROM events"
)


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 state history per user from the event log: one validity
    interval per run of identical event_type, ordered by (ts,
    event_id) so timestamp ties resolve identically everywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    return scd2_history(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak="event_id",
    )


_SCD2_ORACLE = scd2_history_sql(
    _EV_SQL,
    key_cols=["user_id"],
    ts_col="ts",
    attr_cols=["event_type"],
    tiebreak="event_id",
)

# ------------------------------------------------------------ snapshot diff


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release diff (reference ``quality_check.py:1-6``): compare the
    documents table against a deterministically-perturbed next
    release (drops, edits, additions by doc_id mod 13) and summarize
    per-status row counts."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    m = F.col("doc_id") % 13
    new = (
        docs.filter(m != 0)
        .withColumn(
            "n_chars",
            F.when(m == 1, F.col("n_chars") + 1).otherwise(F.col("n_chars")),
        )
        .unionByName(
            docs.filter(m == 2).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1_000_000)
            )
        )
    )
    diff = snapshot_diff(docs, new, ["doc_id"], ["lang", "source", "n_chars"])
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).orderBy("status")


_DOC_OLD_SQL = "SELECT doc_id, lang, source, n_chars FROM documents"
_DOC_NEW_SQL = f"""
SELECT doc_id, lang, source,
       CASE WHEN doc_id % 13 = 1 THEN n_chars + 1 ELSE n_chars END AS n_chars
FROM ({_DOC_OLD_SQL}) WHERE doc_id % 13 <> 0
UNION ALL
SELECT doc_id + 1000000, lang, source, n_chars
FROM ({_DOC_OLD_SQL}) WHERE doc_id % 13 = 2
"""
_DIFF_ORACLE = f"""
SELECT status, COUNT(*) AS n FROM (
{snapshot_diff_sql(_DOC_OLD_SQL, _DOC_NEW_SQL, ['doc_id'], ['lang', 'source', 'n_chars'])}
) GROUP BY status ORDER BY status
"""




def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup refresh: the per-returnflag revenue rollup
    is maintained as self-mergeable state (count + decimal sums); a
    10% delta batch is aggregated alone and MERGED into the snapshot
    built from the other 90% — and the result must hash-equal the
    full recompute (the DuckDB oracle aggregates everything). At
    100 TB this is the difference between touching the delta and
    rescanning the lake."""
    from gis_city_county_spark.operators.cdc import (
        agg_snapshot,
        incremental_agg_refresh,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_orderkey") % 10 != 0)
    delta = li.filter(F.col("l_orderkey") % 10 == 0)
    sums = {"sum_qty": "l_quantity", "sum_price": "l_extendedprice"}
    snap = agg_snapshot(base, ["l_returnflag"], sums)
    d = agg_snapshot(delta, ["l_returnflag"], sums)
    refreshed = incremental_agg_refresh(
        snap, d, ["l_returnflag"], list(sums)
    )
    return refreshed.select(
        "l_returnflag",
        "n_rows",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
    )


from gis_city_county_spark.functions.numeric import dec_sum_sql as _dss

_INCR_ORACLE = f"""
SELECT l_returnflag, COUNT(*) AS n_rows,
       {_dss('l_quantity', 'sum_qty')},
       {_dss('l_extendedprice', 'sum_price')}
FROM lineitem GROUP BY l_returnflag
"""


_TRAVEL_T = "2024-01-15 00:00:00"


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 history: each user's state AS OF a
    fixed instant (validity interval containing T), rolled up to
    state populations — the 'what did the table look like last
    Tuesday' query that SCD2 exists to answer."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    hist = scd2_history(
        ev, key_cols=["user_id"], ts_col="ts", attr_cols=["event_type"],
        tiebreak="event_id",
    )
    t = F.lit(_TRAVEL_T).cast("timestamp")
    at_t = hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
    return at_t.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


_TRAVEL_ORACLE = f"""
WITH hist AS ({scd2_history_sql(_EV_SQL, key_cols=["user_id"], ts_col="ts",
                                attr_cols=["event_type"], tiebreak="event_id")})
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM hist
WHERE valid_from <= TIMESTAMP '{_TRAVEL_T}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_TRAVEL_T}')
GROUP BY 1
"""


def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view refresh: orders and customers each split
    into a base and an insert delta; the view is maintained by the
    delta rule (dA join B_new, A_old join dB) and rolled up per market
    segment. The oracle is the full re-join — identical results, a
    fraction of the work."""
    from gis_city_county_spark.operators.cdc import incremental_join_view

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    a_old = orders.filter(F.col("o_orderdate") < "1996-01-01")
    a_delta = orders.filter(F.col("o_orderdate") >= "1996-01-01")
    b_old = cust.filter(F.col("o_custkey") % 10 < 8)
    b_delta = cust.filter(F.col("o_custkey") % 10 >= 8)
    view = incremental_join_view(a_old, a_delta, b_old, b_delta, ["o_custkey"])
    from gis_city_county_spark.functions.numeric import dec_sum

    return view.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice"), "total_price"),
    )


def _incr_join_oracle() -> str:
    from gis_city_county_spark.functions.numeric import dec_sum_sql

    return f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       {dec_sum_sql("o_totalprice", "total_price")}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def q_feed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-merge change-feed integrity gate over the standard orders
    feed, with injected violations (updates for never-existing keys,
    re-inserts of existing keys) so every audit cell is exercised."""
    from gis_city_county_spark.operators.cdc import feed_audit

    base = _orders_base(spark, sf_dir)
    changes = _orders_changes(base)
    # Inject violations deterministically: shift some update keys out
    # of the base domain, and aim some inserts at existing keys.
    bad = changes.withColumn(
        "o_orderkey",
        F.when(
            (F.col("op") == "U") & (F.col("o_orderkey") % 100 == 3),
            F.col("o_orderkey") + 2000000000,
        ).when(
            (F.col("op") == "I") & (F.col("o_orderkey") % 100 == 1001 % 100),
            F.col("o_orderkey") - 1000000000,
        ).otherwise(F.col("o_orderkey")),
    )
    return feed_audit(base, bad, ["o_orderkey"])


def _feed_audit_oracle() -> str:
    from gis_city_county_spark.operators.cdc import feed_audit_sql

    bad = f"""
SELECT CASE
         WHEN op = 'U' AND o_orderkey % 100 = 3
           THEN o_orderkey + 2000000000
         WHEN op = 'I' AND o_orderkey % 100 = 1
           THEN o_orderkey - 1000000000
         ELSE o_orderkey END AS o_orderkey,
       o_custkey, o_orderstatus, o_totalprice, op
FROM ({_ORD_CHANGES_SQL})
"""
    return feed_audit_sql(_ORD_BASE_SQL, bad, ["o_orderkey"])


SPECS = [
    QuerySpec("cdc_feed_audit", q_feed_audit, _feed_audit_oracle()),
    QuerySpec("cdc_merge_upsert", q_merge_upsert, _MERGE_ORACLE),
    QuerySpec("cdc_time_travel", q_time_travel, _TRAVEL_ORACLE),
    QuerySpec("cdc_incremental_join", q_incremental_join, _incr_join_oracle()),
    QuerySpec("cdc_incremental_rollup", q_incremental_rollup, _INCR_ORACLE),
    QuerySpec("cdc_scd2_history", q_scd2_history, _SCD2_ORACLE),
    QuerySpec("cdc_snapshot_diff", q_snapshot_diff, _DIFF_ORACLE),
]
