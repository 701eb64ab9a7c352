"""Temporal-join queries over the events table: as-of join (latest
click at or before each error, per user) and bucketed range join
(clicks in the 10 minutes before each error)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.mlprep import (
    calibration_bins,
    calibration_bins_sql,
    kfold_stratified,
    kfold_stratified_sql,
    target_encode,
    target_encode_sql,
)
from gis_city_county_spark.operators.profile import gini_impurity, gini_impurity_sql
from gis_city_county_spark.operators.temporal import (
    asof_join,
    asof_join_sql,
    interval_union,
    interval_union_sql,
    range_join,
    range_join_sql,
    sequence_pattern_count,
    sequence_pattern_count_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec

# Nanos-floored events (see events_q._EV_CTE for the convention).
_ERR_SQL = (
    "SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts "
    "FROM events WHERE event_type = 'error'"
)
_CLICK_SQL = (
    "SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts, value "
    "FROM events WHERE event_type = 'click'"
)


def _errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )


def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the user's most recent click at or
    before it (point-in-time-correct feature lookup shape)."""
    return asof_join(
        _errors(spark, sf_dir),
        _clicks(spark, sf_dir),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        right_tiebreak="event_id",
    )


_ASOF_ORACLE = asof_join_sql(
    _ERR_SQL,
    _CLICK_SQL,
    on=["user_id"],
    left_ts="ts",
    right_ts="ts",
    left_cols=["event_id", "user_id", "ts"],
    right_cols=["event_id", "value"],
    right_tiebreak="event_id",
)


def q_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (error, click) pairs per user with the click in the 10
    minutes up to the error, with the lag in seconds."""
    pairs = range_join(
        _errors(spark, sf_dir),
        _clicks(spark, sf_dir),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower_seconds=-600.0,
        upper_seconds=0.0,
    )
    lag = (F.unix_micros("ts") - F.unix_micros("ts_r")).cast("double") / F.lit(1e6)
    return pairs.withColumn("lag_sec", lag)


_RANGE_ORACLE = (
    "SELECT *, CAST(epoch_us(ts) - epoch_us(ts_r) AS DOUBLE) / 1e6 AS lag_sec "
    "FROM ("
    + range_join_sql(
        _ERR_SQL,
        _CLICK_SQL,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower_seconds=-600.0,
        upper_seconds=0.0,
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["event_id", "ts", "value"],
    )
    + ")"
)


_GAP_SECONDS = 21600  # 6 h


def q_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user silence-gap detection: consecutive-event deltas via a
    lag window (ordered by ts with event_id tiebreak — a total order,
    so both engines pair the same neighbors), keeping gaps longer than
    6 hours. One shuffle on user_id; the filter on the lag output
    drops the overwhelmingly-common small gaps before anything else
    consumes them — at 100 TB this is the monitoring query shape for
    'which sensors went dark and for how long'."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    gap = (F.unix_micros(F.col("ts")) - prev_us).cast("double") / F.lit(1e6)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.timestamp_micros(prev_us).alias("prev_ts"),
            gap.alias("gap_sec"),
        )
        .filter(F.col("gap_sec") > _GAP_SECONDS)
        .orderBy("user_id", "ts", "event_id")
    )


_GAP_ORACLE = f"""
SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts,
       make_timestamp(prev_us) AS prev_ts,
       CAST(epoch_us(ts) - prev_us AS DOUBLE) / 1e6 AS gap_sec
FROM (
  SELECT user_id, event_id, ts,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_us
  FROM events
)
WHERE CAST(epoch_us(ts) - prev_us AS DOUBLE) / 1e6 > {_GAP_SECONDS}
ORDER BY user_id, ts, event_id
"""


_EV_CTE = (
    "SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, "
    "event_type, value FROM events"
)


def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged per-user coverage spans: every event opens a 15-minute
    interval; overlapping/adjacent intervals coalesce into maximal
    islands (total watched/active time, the coverage twin of
    sessionize)."""
    ev = load_table(spark, sf_dir, "events")
    return interval_union(ev, "user_id", "ts", duration_seconds=900)


_IUNION_ORACLE = interval_union_sql(_EV_CTE, "user_id", "ts", 900)


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type mix impurity per user cohort (user_id % 16): exact
    integer moments plus the one-division Gini — the label-balance
    diagnostic run before sampling decisions."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "cohort", F.pmod(F.col("user_id"), F.lit(16)).cast("long")
    )
    return gini_impurity(ev, ["cohort"], "event_type")


_GINI_ORACLE = gini_impurity_sql(
    "SELECT user_id % 16 AS cohort, event_type FROM events",
    ["cohort"],
    "event_type",
)


_JOURNEY = {"signup": "s", "view": "v", "click": "c", "purchase": "p"}
_JOURNEY_PAT = "s[vc]*p"


def q_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style journey counting: per user, events
    collapse to a symbol string in event-time order and completed
    signup→(view|click)*→purchase journeys are counted as
    non-overlapping regex matches."""
    ev = load_table(spark, sf_dir, "events")
    return sequence_pattern_count(
        ev, "user_id", "ts", "event_id", "event_type", _JOURNEY, _JOURNEY_PAT
    )


_PATTERN_ORACLE = sequence_pattern_count_sql(
    _EV_CTE, "user_id", "ts", "event_id", "event_type", _JOURNEY, _JOURNEY_PAT
)


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report per event type: discrete median, MAD, and
    the count of values beyond 3×MAD — the resistant anomaly gate."""
    from gis_city_county_spark.operators.profile import mad_outliers

    ev = load_table(spark, sf_dir, "events")
    return mad_outliers(ev, "event_type", "value", k=3.0)


def _mad_oracle() -> str:
    from gis_city_county_spark.operators.profile import mad_outliers_sql

    return mad_outliers_sql(
        "SELECT event_type, value FROM events", "event_type", "value", k=3.0
    )


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-estimate target encoding of the customer market segment by
    mean order value: the smoothed categorical feature (m=10 pulls
    thin segments toward the global prior). One shuffle join to
    attach the segment, one aggregate per side."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("c_mktsegment", "o_totalprice")
    return target_encode(joined, "c_mktsegment", "o_totalprice", m=10.0)


def _target_encode_oracle() -> str:
    return target_encode_sql(
        "(SELECT c_mktsegment, o_totalprice"
        " FROM orders JOIN customer ON o_custkey = c_custkey)",
        "c_mktsegment",
        "o_totalprice",
        m=10.0,
    )


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a deterministic pseudo-score: md5-tail
    milli-probability of the order key vs. the order-is-finished
    label, binned into deciles with per-bin calibration gap."""
    from gis_city_county_spark.operators.sketch import _h60

    orders = load_table(spark, sf_dir, "orders").select(
        (_h60(F.col("o_orderkey").cast("string")) % 1000).alias("pred_milli"),
        (F.col("o_orderstatus") == "F").alias("label"),
    )
    return calibration_bins(orders, "pred_milli", "label", n_bins=10)


def _calibration_oracle() -> str:
    from gis_city_county_spark.operators.sketch import _h60_sql

    pred = f"{_h60_sql('CAST(o_orderkey AS VARCHAR)')} % 1000"
    return calibration_bins_sql(
        f"(SELECT {pred} AS pred_milli, o_orderstatus = 'F' AS label FROM orders)",
        "pred_milli",
        "label",
        n_bins=10,
    )


def q_kfold_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment keyed on the
    order key, with the per-(priority-stratum, fold) balance report
    (count + decimal-exact mean order value) that verifies the folds
    are exchangeable."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return kfold_stratified(
        orders, "o_orderkey", "o_orderpriority", "o_totalprice", n_folds=5
    )


def _kfold_oracle() -> str:
    return kfold_stratified_sql(
        "orders", "o_orderkey", "o_orderpriority", "o_totalprice", n_folds=5
    )


def q_exact_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC per event type: does the event's value predict a
    high props.k? Mann-Whitney with midranks, all-integer until the
    final division — the model-eval metric as a relational program."""
    from gis_city_county_spark.operators.profile import exact_auc

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.get_json_object("props", "$.k").cast("long") >= 50).alias("label"),
    )
    return exact_auc(ev, "event_type", "value", "label")


def _auc_oracle() -> str:
    from gis_city_county_spark.operators.profile import exact_auc_sql

    return exact_auc_sql(
        "SELECT event_type, value, "
        "CAST(json_extract(props, '$.k') AS BIGINT) >= 50 AS label FROM events",
        "event_type",
        "value",
        "label",
    )


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of event values per type (rank-deterministic
    trim set, decimal-exact mean of the keepers) — the robust location
    estimate between mean and median."""
    from gis_city_county_spark.operators.profile import trimmed_mean

    ev = load_table(spark, sf_dir, "events")
    return trimmed_mean(ev, "event_type", "value", "event_id", trim_pct=10)


def _trimmed_oracle() -> str:
    from gis_city_county_spark.operators.profile import trimmed_mean_sql

    return trimmed_mean_sql(
        "SELECT event_type, value, event_id FROM events",
        "event_type",
        "value",
        "event_id",
        trim_pct=10,
    )


def q_quantile_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of every event type's value distribution
    onto the 'click' cohort's — the batch-effect aligner, all integer
    rank arithmetic + broadcast reference join."""
    from gis_city_county_spark.operators.mlprep import quantile_align

    ev = load_table(spark, sf_dir, "events")
    return quantile_align(ev, "event_type", "value", "event_id", "click")


def _qalign_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import quantile_align_sql

    return quantile_align_sql(
        "SELECT event_type, value, event_id FROM events",
        "event_type",
        "value",
        "event_id",
        "click",
    )


def q_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-clamped running balance per user (credits from purchases/
    signups, debits otherwise): the sequential-looking inventory
    update made relational via b = prefix − min(0, running-min
    prefix) — two windows, no state."""
    from gis_city_county_spark.operators.temporal import clamped_running_balance

    ev = load_table(spark, sf_dir, "events")
    delta = F.when(
        F.col("event_type").isin("purchase", "signup"), F.col("value")
    ).otherwise(-F.col("value"))
    return clamped_running_balance(ev, "user_id", "ts", "event_id", delta)


def _clamped_oracle() -> str:
    from gis_city_county_spark.operators.temporal import clamped_running_balance_sql

    return clamped_running_balance_sql(
        _EV_CTE,
        "user_id",
        "ts",
        "event_id",
        "CASE WHEN event_type IN ('purchase', 'signup') THEN value ELSE -value END",
    )


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the price at
    which half the QUANTITY trades (not half the rows) — weighted
    order statistics with exact decimal cumulative weights."""
    from gis_city_county_spark.operators.profile import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    return weighted_median(
        li, "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey"
    )


def _wmedian_oracle() -> str:
    from gis_city_county_spark.operators.profile import weighted_median_sql

    return weighted_median_sql(
        "SELECT l_returnflag, l_extendedprice, l_quantity, l_orderkey FROM lineitem",
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
        "l_orderkey",
    )


_THRESHOLDS = [25.0, 50.0, 100.0, 200.0]


def q_confusion_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep: per event type, the full confusion
    matrix + exact precision/recall at four value thresholds for
    predicting a high props.k — one pass, one aggregate."""
    from gis_city_county_spark.operators.profile import confusion_sweep

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.get_json_object("props", "$.k").cast("long") >= 50).alias("label"),
    )
    return confusion_sweep(ev, "event_type", "value", "label", _THRESHOLDS)


def _confusion_oracle() -> str:
    from gis_city_county_spark.operators.profile import confusion_sweep_sql

    return confusion_sweep_sql(
        "SELECT event_type, value, "
        "CAST(json_extract(props, '$.k') AS BIGINT) >= 50 AS label FROM events",
        "event_type",
        "value",
        "label",
        _THRESHOLDS,
    )


def q_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    user's most recent click/view within the 1-day lookback (as-of
    join with tolerance); purchases with no touch fall in 'none'.
    Output: per channel, attributed purchase count + decimal-exact
    revenue."""
    from gis_city_county_spark.functions.numeric import dec_sum

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    marketing = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "ts", F.col("event_type").alias("channel")
    )
    attributed = asof_join(
        purchases,
        marketing,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["channel", "event_id"],
        right_tiebreak="event_id",
        tolerance_seconds=86400.0,
    )
    return attributed.groupBy(
        F.coalesce(F.col("channel_r"), F.lit("none")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dec_sum(F.col("value"), "revenue"),
    )


def _last_touch_oracle() -> str:
    from gis_city_county_spark.functions.numeric import dec_sum_sql

    return """
WITH p AS (
  SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts, value
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts,
         event_type AS channel
  FROM events WHERE event_type IN ('click', 'view')
),
cand AS (
  SELECT p.event_id, m.channel,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY m.ts DESC, m.event_id DESC) AS rn
  FROM p JOIN m ON m.user_id = p.user_id AND m.ts <= p.ts
   AND epoch_us(m.ts) >= epoch_us(p.ts) - 86400000000
),
best AS (SELECT event_id, channel FROM cand WHERE rn = 1)
SELECT COALESCE(best.channel, 'none') AS channel,
       COUNT(*) AS n_purchases,
       """ + dec_sum_sql("p.value", "revenue") + """
FROM p LEFT JOIN best USING (event_id)
GROUP BY 1
"""


def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier final survival per user cohort: a user 'survives'
    if their last event isn't a purchase (right-censored); the product
    of (1 − dᵢ/nᵢ) over event durations runs as a canonical sorted
    fold — bit-equal across engines."""
    from gis_city_county_spark.operators.temporal import km_survival

    ev = load_table(spark, sf_dir, "events")
    return km_survival(
        ev, "user_id", "ts", "event_type", "purchase",
        F.pmod(F.col("user_id"), F.lit(4)).cast("long"),
    )


def _km_oracle() -> str:
    from gis_city_county_spark.operators.temporal import km_survival_sql

    return km_survival_sql(
        _EV_CTE, "user_id", "ts", "event_type", "purchase", "user_id % 4"
    )


_FUNNEL_STAGES = ["signup", "click", "purchase"]


def q_bounded_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: signup → first click within 2h →
    first purchase within 2h of that click; per-user stage-0 volume
    and per-hop converted counts (late conversions excluded)."""
    from gis_city_county_spark.operators.temporal import bounded_funnel

    ev = load_table(spark, sf_dir, "events")
    return bounded_funnel(
        ev, "user_id", "ts", "event_id", "event_type", _FUNNEL_STAGES, 7200
    )


def _bounded_funnel_oracle() -> str:
    from gis_city_county_spark.operators.temporal import bounded_funnel_sql

    return bounded_funnel_sql(
        _EV_CTE, "user_id", "ts", "event_id", "event_type", _FUNNEL_STAGES, 7200
    )


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorized document-length stats: values clamped
    at the exact p5/p95 rank cut points ((value, id) total order) —
    outlier-robust scaling with engine-exact cuts, group-partitioned
    windows only."""
    from gis_city_county_spark.operators.mlprep import winsorize_stats

    docs = load_table(spark, sf_dir, "documents")
    return winsorize_stats(docs, "lang", "n_chars", "doc_id")


def _winsorize_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import winsorize_stats_sql

    return winsorize_stats_sql("documents", "lang", "n_chars", "doc_id")


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the same
    deterministic pseudo-score as the calibration bins: one row of
    reliability / resolution / uncertainty with exact integer
    numerators and canonical-order folds."""
    from gis_city_county_spark.operators.mlprep import brier_decomposition
    from gis_city_county_spark.operators.sketch import _h60

    orders = load_table(spark, sf_dir, "orders").select(
        (_h60(F.col("o_orderkey").cast("string")) % 1000).alias("pred_milli"),
        (F.col("o_orderstatus") == "F").alias("label"),
    )
    return brier_decomposition(orders, "pred_milli", "label", n_bins=10)


def _brier_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import brier_decomposition_sql
    from gis_city_county_spark.operators.sketch import _h60_sql

    src = (
        f"SELECT ({_h60_sql('CAST(o_orderkey AS VARCHAR)')}) % 1000 AS pred_milli,"
        " o_orderstatus = 'F' AS label FROM orders"
    )
    return brier_decomposition_sql(f"({src})", "pred_milli", "label", n_bins=10)


def q_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Average Precision of event value as a predictor of high
    props.k — precision@k in integer ppm at each positive's global
    rank (two-phase ranged rank/cumsum, no single-partition window),
    one final IEEE division."""
    from gis_city_county_spark.operators.mlprep import average_precision

    ev = load_table(spark, sf_dir, "events").select(
        "value",
        "event_id",
        (F.get_json_object("props", "$.k").cast("long") >= 50).alias("label"),
    )
    return average_precision(ev, "value", "label", "event_id")


def _ap_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import average_precision_sql

    src = (
        "SELECT value, event_id,"
        " CAST(json_extract(props, '$.k') AS BIGINT) >= 50 AS label"
        " FROM events"
    )
    return average_precision_sql(f"({src})", "value", "label", "event_id")


def q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MRR: per user (query group), reciprocal rank of the first
    high-props.k event under a value-desc ranking — integer-ppm
    reciprocals, group-partitioned windows only."""
    from gis_city_county_spark.operators.mlprep import mean_reciprocal_rank

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        "event_id",
        (F.get_json_object("props", "$.k").cast("long") >= 80).alias("label"),
    )
    return mean_reciprocal_rank(ev, "user_id", "value", "label", "event_id")


def q_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NDCG@10 per user: graded relevance (0–3 from props.k
    bands) under a value-desc ranking vs the ideal ordering —
    completes the retrieval-metric family next to AP and MRR.
    Group-partitioned windows only; the log2 discounts are shared
    decimal literals folded in rank order on both engines, so the
    quotient is bit-portable."""
    from gis_city_county_spark.operators.mlprep import ndcg_at_k

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        "event_id",
        F.when(F.get_json_object("props", "$.k").cast("long") >= 90, 3)
        .when(F.get_json_object("props", "$.k").cast("long") >= 70, 2)
        .when(F.get_json_object("props", "$.k").cast("long") >= 50, 1)
        .otherwise(0)
        .alias("rel"),
    )
    return ndcg_at_k(ev, "user_id", "value", "rel", "event_id", k=10)


def _ndcg_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import ndcg_at_k_sql

    src = (
        "SELECT user_id, value, event_id,"
        " CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 90 THEN 3"
        " WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 70 THEN 2"
        " WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50 THEN 1"
        " ELSE 0 END AS rel FROM events"
    )
    return ndcg_at_k_sql(f"({src})", "user_id", "value", "rel", "event_id", k=10)


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic pseudo-raters over
    orders: the order status (3 classes) vs a date-threshold
    heuristic that reuses the F/O labels — chance-corrected
    agreement with exact DECIMAL/HUGEINT numerators and one IEEE
    division."""
    from gis_city_county_spark.operators.mlprep import cohens_kappa

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("rater_model"),
        F.when(F.col("o_orderdate") < F.lit("1995-06-17").cast("date"), "F")
        .otherwise("O")
        .alias("rater_rule"),
    )
    return cohens_kappa(orders, "rater_model", "rater_rule")


def _kappa_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import cohens_kappa_sql

    src = (
        "SELECT o_orderstatus AS rater_model,"
        " CASE WHEN o_orderdate < DATE '1995-06-17' THEN 'F' ELSE 'O' END"
        " AS rater_rule FROM orders"
    )
    return cohens_kappa_sql(f"({src})", "rater_model", "rater_rule")


def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha over the same three pseudo-raters as the
    Fleiss query but with rater 3 rating only HIGH-VALUE orders — the
    variable-ratings-per-item layout Fleiss rejects and alpha is built
    for (items get 2 or 3 ratings)."""
    from gis_city_county_spark.operators.mlprep import krippendorff_alpha

    orders = load_table(spark, sf_dir, "orders")
    long = orders.select(
        F.col("o_orderkey").alias("item"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("rater"),
                    F.col("o_orderstatus").alias("label"),
                ),
                F.struct(
                    F.lit(2).alias("rater"),
                    F.when(
                        F.col("o_orderdate")
                        < F.lit("1995-06-17").cast("date"),
                        F.lit("F"),
                    ).otherwise(F.lit("O")).alias("label"),
                ),
                F.struct(
                    F.lit(3).alias("rater"),
                    F.when(
                        F.col("o_totalprice") >= 150000.0,
                        F.when(
                            F.col("o_orderdate")
                            < F.lit("1995-06-17").cast("date"),
                            F.lit("F"),
                        ).otherwise(F.lit("O")),
                    ).alias("label"),  # NULL below the cut: no rating
                ),
            )
        ).alias("r"),
    ).select(
        "item",
        F.col("r.rater").alias("rater"),
        F.col("r.label").alias("label"),
    )
    return krippendorff_alpha(long, "item", "rater", "label")


def _krippendorff_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import krippendorff_alpha_sql

    src = (
        "SELECT o_orderkey AS item, 1 AS rater, o_orderstatus AS label"
        " FROM orders"
        " UNION ALL SELECT o_orderkey, 2,"
        " CASE WHEN o_orderdate < DATE '1995-06-17' THEN 'F' ELSE 'O' END"
        " FROM orders"
        " UNION ALL SELECT o_orderkey, 3,"
        " CASE WHEN o_totalprice >= 150000.0 THEN"
        " (CASE WHEN o_orderdate < DATE '1995-06-17' THEN 'F' ELSE 'O' END)"
        " END FROM orders"
    )
    return krippendorff_alpha_sql(f"({src})", "item", "rater", "label")


def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user RFM quintiles over the events stream — rank-based exact
    tiles via the two-phase ranged_rank (no single-partition window at
    any user count)."""
    from gis_city_county_spark.operators.temporal import rfm_scores

    ev = load_table(spark, sf_dir, "events")
    return rfm_scores(ev, "user_id", "ts", "value")


def _rfm_oracle() -> str:
    from gis_city_county_spark.operators.temporal import rfm_scores_sql

    return rfm_scores_sql("SELECT * FROM events", "user_id", "ts", "value")


def q_token_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro token-classification F1 per source: a deterministic
    stopword tagger (gold = en stoplist membership) scored against a
    short-token heuristic (pred = length <= 3) over every document
    token — the exact-ppm extraction eval."""
    from gis_city_county_spark.operators.mlprep import token_f1
    from gis_city_county_spark.operators.textstats import STOPWORDS, tokens

    docs = load_table(spark, sf_dir, "documents")
    long = docs.select(
        "source", F.explode(tokens("text")).alias("tok")
    ).select(
        "source",
        F.col("tok").isin(*STOPWORDS["en"]).alias("gold"),
        (F.length("tok") <= 3).alias("pred"),
    )
    return token_f1(long, "source", "gold", "pred")


def _token_f1_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import token_f1_sql
    from gis_city_county_spark.operators.textstats import (
        STOPWORDS,
        tokens_sql,
    )

    words = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    src = (
        f"SELECT source, tok IN ({words}) AS gold,"
        " length(tok) <= 3 AS pred FROM ("
        f"SELECT source, unnest({tokens_sql('text')}) AS tok"
        " FROM documents)"
    )
    return token_f1_sql(f"({src})", "source", "gold", "pred")


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over three deterministic pseudo-raters per order
    (the status column, a date rule, a price rule — all labeling into
    the F/O space): multi-annotator chance-corrected agreement with
    exact DECIMAL numerators and a fixed-order IEEE tail."""
    from gis_city_county_spark.operators.mlprep import fleiss_kappa

    orders = load_table(spark, sf_dir, "orders")
    long = orders.select(
        F.col("o_orderkey").alias("item"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("rater"),
                    F.col("o_orderstatus").alias("label"),
                ),
                F.struct(
                    F.lit(2).alias("rater"),
                    F.when(
                        F.col("o_orderdate")
                        < F.lit("1995-06-17").cast("date"),
                        F.lit("F"),
                    ).otherwise(F.lit("O")).alias("label"),
                ),
                F.struct(
                    F.lit(3).alias("rater"),
                    F.when(F.col("o_totalprice") < 150000.0, F.lit("F"))
                    .otherwise(F.lit("O")).alias("label"),
                ),
            )
        ).alias("r"),
    ).select(
        "item",
        F.col("r.rater").alias("rater"),
        F.col("r.label").alias("label"),
    )
    return fleiss_kappa(long, "item", "rater", "label")


def _fleiss_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import fleiss_kappa_sql

    src = (
        "SELECT o_orderkey AS item, 1 AS rater, o_orderstatus AS label"
        " FROM orders"
        " UNION ALL SELECT o_orderkey, 2,"
        " CASE WHEN o_orderdate < DATE '1995-06-17' THEN 'F' ELSE 'O' END"
        " FROM orders"
        " UNION ALL SELECT o_orderkey, 3,"
        " CASE WHEN o_totalprice < 150000.0 THEN 'F' ELSE 'O' END"
        " FROM orders"
    )
    return fleiss_kappa_sql(f"({src})", "item", "rater", "label")


def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation of the date-rule pseudo-classifier against
    the finished-order label — the imbalance-honest single-number
    confusion summary (exact DECIMAL cells, two IEEE sqrt calls)."""
    from gis_city_county_spark.operators.mlprep import matthews_corr

    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderstatus") == "F").alias("is_final"),
        (F.col("o_orderdate") < F.lit("1995-06-17").cast("date")).alias(
            "pred_final"
        ),
    )
    return matthews_corr(orders, "is_final", "pred_final")


def _mcc_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import matthews_corr_sql

    src = (
        "SELECT o_orderstatus = 'F' AS is_final,"
        " o_orderdate < DATE '1995-06-17' AS pred_final FROM orders"
    )
    return matthews_corr_sql(f"({src})", "is_final", "pred_final")


def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error of the md5-milli pseudo-score vs the
    finished-order label — the single exact-integer-numerator headline
    number over the same deciles as eval_calibration_bins, with the
    worst bin's gap riding along in exact ppm."""
    from gis_city_county_spark.operators.mlprep import (
        expected_calibration_error,
    )
    from gis_city_county_spark.operators.sketch import _h60

    orders = load_table(spark, sf_dir, "orders").select(
        (_h60(F.col("o_orderkey").cast("string")) % 1000).alias("pred_milli"),
        (F.col("o_orderstatus") == "F").alias("label"),
    )
    return expected_calibration_error(orders, "pred_milli", "label", n_bins=10)


def _ece_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import (
        expected_calibration_error_sql,
    )
    from gis_city_county_spark.operators.sketch import _h60_sql

    pred = f"{_h60_sql('CAST(o_orderkey AS VARCHAR)')} % 1000"
    return expected_calibration_error_sql(
        f"(SELECT {pred} AS pred_milli, o_orderstatus = 'F' AS label"
        " FROM orders)",
        "pred_milli",
        "label",
        n_bins=10,
    )


def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution: every purchase splits 1000
    exact milli-credits over its click/view path in the 1-day
    lookback (400 first / 400 last / 200 across middles, remainder to
    the last); purchases with no touch credit 'none'."""
    from gis_city_county_spark.operators.temporal import position_attribution

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "ts",
        F.col("event_type").alias("channel"),
    )
    return position_attribution(
        purchases, touches,
        key_cols=["user_id"], conv_id="event_id", conv_ts="ts",
        touch_ts="ts", channel_col="channel", touch_tiebreak="event_id",
        lookback_seconds=86400.0,
    )


def _position_attr_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        position_attribution_sql,
    )

    return position_attribution_sql(
        "SELECT event_id, user_id, ts FROM events"
        " WHERE event_type = 'purchase'",
        "SELECT event_id, user_id, ts, event_type AS channel FROM events"
        " WHERE event_type IN ('click', 'view')",
        key_cols=["user_id"], conv_id="event_id", conv_ts="ts",
        touch_ts="ts", channel_col="channel", touch_tiebreak="event_id",
        lookback_seconds=86400.0,
    )


def _mrr_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import mean_reciprocal_rank_sql

    src = (
        "SELECT user_id, value, event_id,"
        " CAST(json_extract(props, '$.k') AS BIGINT) >= 80 AS label"
        " FROM events"
    )
    return mean_reciprocal_rank_sql(
        f"({src})", "user_id", "value", "label", "event_id"
    )


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-redundancy screen: pairwise Pearson matrix over the
    four lineitem money/quantity features in ONE map-combinable scan
    (exact integer moments, C(4,2)=6 output rows)."""
    from gis_city_county_spark.operators.mlprep import corr_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return corr_matrix(
        li,
        {
            "qty": F.col("l_quantity"),
            "price": F.col("l_extendedprice"),
            "disc": F.col("l_discount"),
            "tax": F.col("l_tax"),
        },
    )


def _corr_matrix_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import corr_matrix_sql

    return corr_matrix_sql(
        "SELECT * FROM lineitem",
        {
            "qty": "l_quantity",
            "price": "l_extendedprice",
            "disc": "l_discount",
            "tax": "l_tax",
        },
    )


def q_loo_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-honest leave-one-out encoding of order priority by
    order total: each order's feature is the mean price of the OTHER
    orders in its priority class (exact milli-cents)."""
    from gis_city_county_spark.operators.mlprep import loo_target_encode

    o = load_table(spark, sf_dir, "orders")
    return loo_target_encode(o, "o_orderkey", "o_orderpriority", "o_totalprice")


def _loo_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import loo_target_encode_sql

    return loo_target_encode_sql(
        "SELECT * FROM orders", "o_orderkey", "o_orderpriority", "o_totalprice"
    )


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (average-rank ties, distinct-value
    ranking — no global row window) between lineitem quantity and
    extended price: the ordinal association check."""
    from gis_city_county_spark.operators.mlprep import spearman_corr

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_quantity", "l_extendedprice")


def _spearman_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import spearman_corr_sql

    return spearman_corr_sql(
        "SELECT * FROM lineitem", "l_quantity", "l_extendedprice"
    )


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 90%-ish CI for the mean order
    total (32 hash-seeded replicas, exact milli-cents) — uncertainty
    without global resampling coordination."""
    from gis_city_county_spark.operators.mlprep import bootstrap_ci

    o = load_table(spark, sf_dir, "orders")
    return bootstrap_ci(o, "o_orderkey", "o_totalprice")


def _bootstrap_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import bootstrap_ci_sql

    return bootstrap_ci_sql(
        "SELECT * FROM orders", "o_orderkey", "o_totalprice"
    )


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-classifier comparison on the same events (two threshold
    rules vs a synthetic label): discordant cells + the exact milli
    McNemar statistic."""
    from gis_city_county_spark.operators.mlprep import mcnemar_test

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("value") >= 50).cast("int").alias("pa"),
        (F.col("value") >= 60).cast("int").alias("pb"),
        (F.col("user_id") % 2).cast("int").alias("y"),
    )
    return mcnemar_test(ev, "event_id", "pa", "pb", "y")


def _mcnemar_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import mcnemar_test_sql

    src = (
        "SELECT event_id, CAST(value >= 50 AS INTEGER) AS pa,"
        " CAST(value >= 60 AS INTEGER) AS pb,"
        " CAST(user_id % 2 AS INTEGER) AS y FROM events"
    )
    return mcnemar_test_sql(src, "event_id", "pa", "pb", "y")


def q_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d of urgent vs non-urgent order totals — the practical
    -significance companion to the A/B uplift test, from exact integer
    moments."""
    from gis_city_county_spark.operators.mlprep import effect_size

    o = load_table(spark, sf_dir, "orders")
    return effect_size(o, "o_orderpriority", "1-URGENT", "o_totalprice")


def _effect_size_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import effect_size_sql

    return effect_size_sql(
        "SELECT * FROM orders", "o_orderpriority", "'1-URGENT'",
        "o_totalprice",
    )


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (contingency-based, tie-corrected) between
    lineitem quantity and the discount percentage — both naturally
    bucketed ordinals (50 and 11 levels), the regime the
    distinct-cell self-join is built for."""
    from gis_city_county_spark.operators.mlprep import kendall_tau
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
    )
    return kendall_tau(li, "qty", "disc_pct")


def _kendall_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import kendall_tau_sql

    return kendall_tau_sql(
        "SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qty,"
        " CAST(FLOOR(l_discount * 100) AS BIGINT) AS disc_pct"
        " FROM lineitem",
        "qty", "disc_pct",
    )


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between order status and order priority — the
    categorical-association screen (exact pico-units χ² identity,
    cells never rows)."""
    from gis_city_county_spark.operators.mlprep import cramers_v

    o = load_table(spark, sf_dir, "orders")
    return cramers_v(o, "o_orderstatus", "o_orderpriority")


def _cramers_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import cramers_v_sql

    return cramers_v_sql(
        "SELECT * FROM orders", "o_orderstatus", "o_orderpriority"
    )


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit over the documents vocabulary:
    per bucket-occupancy level, bucket and occurrence counts
    (including the empty-bucket row, so widths cross-foot)."""
    from gis_city_county_spark.operators.mlprep import (
        feature_hash_collision_audit,
    )

    docs = load_table(spark, sf_dir, "documents")
    return feature_hash_collision_audit(docs, "text", n_buckets=1024)


def _feature_hashing_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import (
        feature_hash_collision_audit_sql,
    )

    return feature_hash_collision_audit_sql(
        "SELECT * FROM documents", "text", n_buckets=1024
    )



def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick transform itself: sparse signed bucket
    counts per document (vocabulary-free, join-free, fit-free)."""
    from gis_city_county_spark.operators.mlprep import hashed_features

    docs = load_table(spark, sf_dir, "documents")
    return hashed_features(docs, "doc_id", "text", n_buckets=256)


def _hashed_features_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import hashed_features_sql

    return hashed_features_sql(
        "SELECT * FROM documents", "doc_id", "text", n_buckets=256
    )



def q_iqr_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit on order totals: exact
    lower-convention quartiles in cents, milli-cent fences, exact
    outside-fence counts (two-phase bucketed cumsum, never a global
    window)."""
    from gis_city_county_spark.operators.mlprep import iqr_outlier_audit

    o = load_table(spark, sf_dir, "orders")
    return iqr_outlier_audit(o, "o_totalprice")


def _iqr_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import iqr_outlier_audit_sql

    return iqr_outlier_audit_sql("SELECT * FROM orders", "o_totalprice")



def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between two document-quality rankings
    (character length vs BPE token count, both length-flavored so
    the top-weighted agreement is high but not perfect) — exact
    integer p=1/2 terms, see operators.mlprep.rbo_at_k."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.mlprep import rbo_at_k
    from gis_city_county_spark.operators.textstats import bpe_token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        bpe_token_count("text").cast("bigint").alias("n_bpe"),
    )
    return rbo_at_k(docs, "doc_id", "n_chars", "n_bpe", k=20)


def _rbo_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import rbo_at_k_sql
    from gis_city_county_spark.operators.textstats import (
        bpe_token_count_sql,
    )

    inner = (
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,"
        f" CAST({bpe_token_count_sql('text')} AS BIGINT) AS n_bpe"
        " FROM documents"
    )
    return rbo_at_k_sql(f"({inner})", "doc_id", "n_chars", "n_bpe", k=20)



def q_cochrans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over three threshold classifiers on the same
    events (value ≥ 40/50/60 vs the synthetic parity label) — the
    k-classifier McNemar, long (item, rater, correct) relation."""
    from gis_city_county_spark.operators.mlprep import cochrans_q

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "value",
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("y"),
    )
    long = ev.select(
        "event_id",
        F.explode(
            F.array(*[F.lit(t).cast("int") for t in (40, 50, 60)])
        ).alias("rater"),
        "value", "y",
    ).select(
        "event_id",
        "rater",
        ((F.col("value") >= F.col("rater")).cast("int") == F.col("y"))
        .cast("int").alias("correct"),
    )
    return cochrans_q(long, "event_id", "rater", "correct")


def _cochrans_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import cochrans_q_sql

    src = (
        "SELECT event_id, thr AS rater,"
        " CAST(CAST(value >= thr AS INTEGER)"
        "      = CAST(user_id % 2 AS INTEGER) AS INTEGER) AS correct"
        " FROM events, (SELECT unnest([40, 50, 60]) AS thr)"
    )
    return cochrans_q_sql(src, "event_id", "rater", "correct")


def q_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over paired per-order half totals (even-
    vs odd-numbered lines, exact cents) — midrank ties in milli units
    over the distinct-|d| cells, never a rank window over raw rows."""
    from gis_city_county_spark.operators.mlprep import wilcoxon_signed_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    pairs = li.groupBy("l_orderkey").agg(
        F.sum(
            F.when(
                F.col("l_linenumber") % 2 == 0,
                F.floor(F.col("l_extendedprice") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("a_cents"),
        F.sum(
            F.when(
                F.col("l_linenumber") % 2 == 1,
                F.floor(F.col("l_extendedprice") * 100).cast("bigint"),
            ).otherwise(F.lit(0))
        ).alias("b_cents"),
    )
    return wilcoxon_signed_rank(pairs, "a_cents", "b_cents")


def _wilcoxon_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import (
        wilcoxon_signed_rank_sql,
    )

    src = (
        "SELECT l_orderkey,"
        " SUM(CASE WHEN l_linenumber % 2 = 0 THEN"
        " CAST(FLOOR(l_extendedprice * 100) AS BIGINT) ELSE 0 END)"
        " AS a_cents,"
        " SUM(CASE WHEN l_linenumber % 2 = 1 THEN"
        " CAST(FLOOR(l_extendedprice * 100) AS BIGINT) ELSE 0 END)"
        " AS b_cents"
        " FROM lineitem GROUP BY 1"
    )
    return wilcoxon_signed_rank_sql(src, "a_cents", "b_cents")


def q_perm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic paired permutation test on paired order-half
    quantities: md5 sign flips per replica, exact-integer replica
    sums, +1-smoothed p-value in ppm."""
    from gis_city_county_spark.operators.mlprep import permutation_test

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    pairs = li.groupBy("l_orderkey").agg(
        F.sum(
            F.when(F.col("l_linenumber") % 2 == 0,
                   F.floor("l_quantity").cast("bigint")).otherwise(F.lit(0))
        ).alias("a_qty"),
        F.sum(
            F.when(F.col("l_linenumber") % 2 == 1,
                   F.floor("l_quantity").cast("bigint")).otherwise(F.lit(0))
        ).alias("b_qty"),
    )
    return permutation_test(pairs, "l_orderkey", "a_qty", "b_qty",
                            n_replicas=64)


def _perm_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import permutation_test_sql

    src = (
        "SELECT l_orderkey,"
        " SUM(CASE WHEN l_linenumber % 2 = 0 THEN"
        " CAST(FLOOR(l_quantity) AS BIGINT) ELSE 0 END) AS a_qty,"
        " SUM(CASE WHEN l_linenumber % 2 = 1 THEN"
        " CAST(FLOOR(l_quantity) AS BIGINT) ELSE 0 END) AS b_qty"
        " FROM lineitem GROUP BY 1"
    )
    return permutation_test_sql(src, "l_orderkey", "a_qty", "b_qty",
                                n_replicas=64)


def q_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift & gains over scored events (value as the score,
    user parity as the label): exact ppm response/capture/lift per
    band, two-phase ranked, cumulative over the 10-row band frame."""
    from gis_city_county_spark.operators.mlprep import lift_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 1000).cast("bigint").alias("score_milli"),
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("y"),
    )
    return lift_table(ev, "event_id", "score_milli", "y")


def _lift_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import lift_table_sql

    src = (
        "SELECT event_id,"
        " CAST(FLOOR(value * 1000) AS BIGINT) AS score_milli,"
        " CAST(user_id % 2 AS INTEGER) AS y FROM events"
    )
    return lift_table_sql(src, "event_id", "score_milli", "y")


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance between click and error event values —
    exact-integer ECDF gap over the distinct-value cells (see
    operators.mlprep.ks_test)."""
    from gis_city_county_spark.operators.mlprep import ks_test

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    ).select(
        (F.col("event_type") == "error").cast("int").alias("side"),
        F.floor(F.col("value")).cast("bigint").alias("v"),
    )
    return ks_test(ev, "side", "v")


def _ks_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import ks_test_sql

    src = (
        "SELECT CAST(event_type = 'error' AS INTEGER) AS side,"
        " CAST(FLOOR(value) AS BIGINT) AS v FROM events"
        " WHERE event_type IN ('click', 'error')"
    )
    return ks_test_sql(src, "side", "v")


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U + Cliff's delta between the user-parity arms
    over exact order totals in cents — distinct values ~ |orders|, so
    the midrank prefix sum runs through the two-phase ranged_cumsum
    (see operators.mlprep.mann_whitney_u)."""
    from gis_city_county_spark.operators.mlprep import mann_whitney_u

    o = load_table(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(2)).cast("int").alias("side"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    return mann_whitney_u(o, "side", "v")


def _mann_whitney_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import mann_whitney_u_sql

    src = (
        "SELECT CAST(o_custkey % 2 AS INTEGER) AS side,"
        " CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v"
        " FROM orders"
    )
    return mann_whitney_u_sql(src, "side", "v")


def q_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted kappa between two ordinal 0-5 graders
    derived from lineitem quantities (the second grader disagrees by
    the line number's nudge) — fully scan-side moment factorization
    (see operators.mlprep.weighted_kappa)."""
    from gis_city_county_spark.operators.mlprep import weighted_kappa

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.floor(F.col("l_quantity") / 10)).cast("bigint").alias("ra"),
        (F.floor((F.col("l_quantity") + F.col("l_linenumber")) / 10))
        .cast("bigint").alias("rb"),
    )
    return weighted_kappa(li, "ra", "rb")


def _weighted_kappa_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import weighted_kappa_sql

    src = (
        "SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS ra,"
        " CAST(FLOOR((l_quantity + l_linenumber) / 10) AS BIGINT) AS rb"
        " FROM lineitem"
    )
    return weighted_kappa_sql(src, "ra", "rb")


def q_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance (standardized mean difference) between the
    user-parity arms over order metrics — the pre-readout A/B health
    check (see operators.mlprep.smd_balance)."""
    from gis_city_county_spark.operators.mlprep import smd_balance

    o = load_table(spark, sf_dir, "orders").select(
        F.pmod(F.col("o_custkey"), F.lit(2)).cast("int").alias("arm"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.length("o_orderpriority").cast("double").alias("priority_len"),
    )
    return smd_balance(o, "arm", ["totalprice", "priority_len"])


def _smd_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import smd_balance_sql

    src = (
        "SELECT CAST(o_custkey % 2 AS INTEGER) AS arm,"
        " CAST(o_totalprice AS DOUBLE) AS totalprice,"
        " CAST(length(o_orderpriority) AS DOUBLE) AS priority_len"
        " FROM orders"
    )
    return smd_balance_sql(src, "arm", ["totalprice", "priority_len"])


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths over per-user event-type preferences
    (within each user, the type with the higher event count beats the
    lower; ties skipped) — the pairwise-preference fit in its
    integer-exact MM form (see operators.mlprep.bradley_terry)."""
    from gis_city_county_spark.operators.mlprep import bradley_terry

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("__c")
    )
    a = counts.select("user_id", F.col("event_type").alias("ta"),
                      F.col("__c").alias("ca"))
    b = counts.select("user_id", F.col("event_type").alias("tb"),
                      F.col("__c").alias("cb"))
    contests = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .filter(F.col("ca") != F.col("cb"))
        .select(
            F.when(F.col("ca") > F.col("cb"), F.col("ta"))
            .otherwise(F.col("tb")).alias("winner"),
            F.when(F.col("ca") > F.col("cb"), F.col("tb"))
            .otherwise(F.col("ta")).alias("loser"),
        )
    )
    return bradley_terry(contests, "winner", "loser", rounds=8)


def _bt_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import bradley_terry_sql

    contests = (
        "WITH counts AS ("
        " SELECT user_id, event_type, COUNT(*) AS c"
        " FROM events GROUP BY 1, 2)"
        " SELECT CASE WHEN a.c > b.c THEN a.event_type"
        "        ELSE b.event_type END AS winner,"
        "        CASE WHEN a.c > b.c THEN b.event_type"
        "        ELSE a.event_type END AS loser"
        " FROM counts a JOIN counts b ON a.user_id = b.user_id"
        "  AND a.event_type < b.event_type AND a.c != b.c"
    )
    return bradley_terry_sql(contests, "winner", "loser", rounds=8)


def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the per-returnflag bulk-order
    rate (quantity ≥ 25) — exact integer counts, one fixed-order
    IEEE tail per group."""
    from gis_city_county_spark.operators.mlprep import wilson_ci

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_quantity") >= 25).cast("int").alias("bulk"),
    )
    return wilson_ci(li, "l_returnflag", "bulk")


def _wilson_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import wilson_ci_sql

    src = (
        "SELECT l_returnflag,"
        " CAST(l_quantity >= 25 AS INTEGER) AS bulk"
        " FROM lineitem"
    )
    return wilson_ci_sql(src, "l_returnflag", "bulk")


def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over order revenue: odd customers
    are the "treated" arm, orders from 1995-07-01 on are "post", the
    outcome is order total in exact cents (see
    operators.mlprep.did_estimate)."""
    from gis_city_county_spark.operators.mlprep import did_estimate

    od = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 2).cast("int").alias("arm"),
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-07-01")))
        .cast("int").alias("period"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint")
        .alias("cents"),
    )
    return did_estimate(od, "arm", "period", "cents")


def _did_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import did_estimate_sql

    src = (
        "SELECT CAST(o_custkey % 2 AS INTEGER) AS arm,"
        " CAST(o_orderdate >= TIMESTAMP '1995-07-01' AS INTEGER)"
        " AS period,"
        " CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents"
        " FROM orders"
    )
    return did_estimate_sql(src, "arm", "period", "cents")


def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up over a deterministic per-part
    p-value battery (10% of parts carry a strong signal, p < 500 ppm;
    the rest are near-uniform) — the multiple-testing gate in its
    exact cross-multiplied-integer form (see
    operators.mlprep.bh_fdr)."""
    from gis_city_county_spark.operators.mlprep import bh_fdr

    pv = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("bigint").alias("test_id"),
        F.when(
            F.col("p_partkey") % 10 == 0,
            (F.col("p_partkey") * 37) % 500,
        ).otherwise(
            1000 + (F.col("p_partkey") * 7919) % 999001
        ).cast("bigint").alias("p_ppm"),
    )
    return bh_fdr(pv, "test_id", "p_ppm")


def _bh_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import bh_fdr_sql

    src = (
        "SELECT CAST(p_partkey AS BIGINT) AS test_id,"
        " CAST(CASE WHEN p_partkey % 10 = 0"
        " THEN (p_partkey * 37) % 500"
        " ELSE 1000 + (p_partkey * 7919) % 999001 END AS BIGINT)"
        " AS p_ppm"
        " FROM part"
    )
    return bh_fdr_sql(src, "test_id", "p_ppm")


def q_mh_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel odds ratio for big-ticket orders (total ≥
    150k) by customer-parity arm, stratified on order priority — the
    confounder-adjusted pooled 2×2 readout (see
    operators.mlprep.mantel_haenszel_or)."""
    from gis_city_county_spark.operators.mlprep import mantel_haenszel_or

    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("stratum"),
        (F.col("o_custkey") % 2).cast("int").alias("arm"),
        (F.col("o_totalprice") >= 150000).cast("int").alias("big"),
    )
    return mantel_haenszel_or(od, "stratum", "arm", "big")


def _mh_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import (
        mantel_haenszel_or_sql,
    )

    src = (
        "SELECT o_orderpriority AS stratum,"
        " CAST(o_custkey % 2 AS INTEGER) AS arm,"
        " CAST(o_totalprice >= 150000 AS INTEGER) AS big"
        " FROM orders"
    )
    return mantel_haenszel_or_sql(src, "stratum", "arm", "big")


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted revenue lift with quantity as the covariate
    (strongly correlated with extended price by construction) over
    part-parity arms — the variance-reduced experiment readout (see
    operators.mlprep.cuped_lift)."""
    from gis_city_county_spark.operators.mlprep import cuped_lift

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 2).cast("int").alias("arm"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("cents"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    return cuped_lift(li, "arm", "cents", "qty")


def _cuped_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import cuped_lift_sql

    src = (
        "SELECT CAST(l_partkey % 2 AS INTEGER) AS arm,"
        " CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,"
        " CAST(FLOOR(l_quantity) AS BIGINT) AS qty"
        " FROM lineitem"
    )
    return cuped_lift_sql(src, "arm", "cents", "qty")


def q_icc_deff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-cluster correlation + Kish design effect of line-item
    revenue clustered by order — the clustered-randomization
    effective-sample-size check (see
    operators.mlprep.icc_design_effect)."""
    from gis_city_county_spark.operators.mlprep import icc_design_effect

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("cluster"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("cents"),
    )
    return icc_design_effect(li, "cluster", "cents")


def _icc_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import (
        icc_design_effect_sql,
    )

    src = (
        "SELECT l_orderkey AS cluster,"
        " CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents"
        " FROM lineitem"
    )
    return icc_design_effect_sql(src, "cluster", "cents")


def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit at α = 10% with order-parity
    calibration/test splits and cent-valued nonconformity scores
    (see operators.mlprep.conformal_coverage)."""
    from gis_city_county_spark.operators.mlprep import conformal_coverage

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 2).cast("int").alias("split"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("score"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("bigint").alias("rid"),
    )
    return conformal_coverage(li, "split", "score", "rid")


def _conformal_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import (
        conformal_coverage_sql,
    )

    src = (
        "SELECT CAST(l_orderkey % 2 AS INTEGER) AS split,"
        " CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS score,"
        " CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS rid"
        " FROM lineitem"
    )
    return conformal_coverage_sql(src, "split", "score", "rid")


def q_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (25/50/75) of line-item revenue
    cents across part-parity arms — exact rank-selected per-arm
    quantiles and lifts (see
    operators.mlprep.quantile_treatment_effect)."""
    from gis_city_county_spark.operators.mlprep import (
        quantile_treatment_effect,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 2).cast("int").alias("arm"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("cents"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("bigint").alias("rid"),
    )
    return quantile_treatment_effect(li, "arm", "cents", "rid")


def _qte_oracle() -> str:
    from gis_city_county_spark.operators.mlprep import (
        quantile_treatment_effect_sql,
    )

    src = (
        "SELECT CAST(l_partkey % 2 AS INTEGER) AS arm,"
        " CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,"
        " CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS rid"
        " FROM lineitem"
    )
    return quantile_treatment_effect_sql(src, "arm", "cents", "rid")


SPECS = [
    QuerySpec("eval_mcnemar", q_mcnemar, _mcnemar_oracle()),
    QuerySpec("eval_effect_size", q_effect_size, _effect_size_oracle()),
    QuerySpec("eval_bootstrap_ci", q_bootstrap_ci, _bootstrap_oracle()),
    QuerySpec("mlprep_corr_matrix", q_corr_matrix, _corr_matrix_oracle()),
    QuerySpec("mlprep_loo_target_encode", q_loo_target_encode, _loo_oracle()),
    QuerySpec("eval_spearman", q_spearman, _spearman_oracle()),
    QuerySpec("eval_kendall_tau", q_kendall_tau, _kendall_oracle()),
    QuerySpec("mlprep_cramers_v", q_cramers_v, _cramers_oracle()),
    QuerySpec("mlprep_feature_hashing", q_feature_hashing,
              _feature_hashing_oracle()),
    QuerySpec("mlprep_hashed_features", q_hashed_features,
              _hashed_features_oracle()),
    QuerySpec("mlprep_iqr_outliers", q_iqr_outlier_audit, _iqr_oracle()),
    QuerySpec("eval_rbo", q_rbo, _rbo_oracle()),
    QuerySpec("eval_cochrans_q", q_cochrans_q, _cochrans_oracle()),
    QuerySpec("eval_wilcoxon", q_wilcoxon, _wilcoxon_oracle()),
    QuerySpec("eval_perm_test", q_perm_test, _perm_oracle()),
    QuerySpec("eval_wilson_ci", q_wilson_ci, _wilson_oracle()),
    QuerySpec("eval_lift_table", q_lift_table, _lift_oracle()),
    QuerySpec("eval_ks_test", q_ks_test, _ks_oracle()),
    QuerySpec("eval_mann_whitney", q_mann_whitney, _mann_whitney_oracle()),
    QuerySpec("eval_weighted_kappa", q_weighted_kappa,
              _weighted_kappa_oracle()),
    QuerySpec("mlprep_smd_balance", q_smd_balance, _smd_oracle()),
    QuerySpec("eval_bradley_terry", q_bradley_terry, _bt_oracle()),
    QuerySpec("eval_did", q_did, _did_oracle()),
    QuerySpec("eval_bh_fdr", q_bh_fdr, _bh_oracle()),
    QuerySpec("eval_mh_odds", q_mh_odds, _mh_oracle()),
    QuerySpec("eval_cuped", q_cuped, _cuped_oracle()),
    QuerySpec("mlprep_icc_deff", q_icc_deff, _icc_oracle()),
    QuerySpec("eval_conformal", q_conformal, _conformal_oracle()),
    QuerySpec("eval_qte", q_qte, _qte_oracle()),
    QuerySpec("events_asof_join", q_asof, _ASOF_ORACLE),
    QuerySpec("mlprep_winsorize", q_winsorize, _winsorize_oracle()),
    QuerySpec("eval_brier_decomposition", q_brier_decomposition, _brier_oracle()),
    QuerySpec("eval_average_precision", q_average_precision, _ap_oracle()),
    QuerySpec("eval_mrr", q_mrr, _mrr_oracle()),
    QuerySpec("eval_ndcg_at_k", q_ndcg_at_k, _ndcg_oracle()),
    QuerySpec("eval_cohens_kappa", q_cohens_kappa, _kappa_oracle()),
    QuerySpec("eval_fleiss_kappa", q_fleiss_kappa, _fleiss_oracle()),
    QuerySpec("eval_krippendorff_alpha", q_krippendorff_alpha,
              _krippendorff_oracle()),
    QuerySpec("events_rfm_scores", q_rfm_scores, _rfm_oracle()),
    QuerySpec("eval_token_f1", q_token_f1, _token_f1_oracle()),
    QuerySpec("eval_mcc", q_mcc, _mcc_oracle()),
    QuerySpec("events_position_attribution", q_position_attribution,
              _position_attr_oracle()),
    QuerySpec("eval_ece", q_ece, _ece_oracle()),
    QuerySpec("events_bounded_funnel", q_bounded_funnel, _bounded_funnel_oracle()),
    QuerySpec("events_last_touch_attribution", q_last_touch, _last_touch_oracle()),
    QuerySpec("events_km_survival", q_km_survival, _km_oracle()),
    QuerySpec("events_pattern_match", q_pattern_match, _PATTERN_ORACLE),
    QuerySpec("profile_mad_outliers", q_mad_outliers, _mad_oracle()),
    QuerySpec("eval_exact_auc", q_exact_auc, _auc_oracle()),
    QuerySpec("eval_confusion_sweep", q_confusion_sweep, _confusion_oracle()),
    QuerySpec("eval_calibration_bins", q_calibration_bins, _calibration_oracle()),
    QuerySpec("mlprep_target_encode", q_target_encode, _target_encode_oracle()),
    QuerySpec("mlprep_kfold_stratified", q_kfold_stratified, _kfold_oracle()),
    QuerySpec("profile_trimmed_mean", q_trimmed_mean, _trimmed_oracle()),
    QuerySpec("profile_weighted_median", q_weighted_median, _wmedian_oracle()),
    QuerySpec("mlprep_quantile_align", q_quantile_align, _qalign_oracle()),
    QuerySpec("events_clamped_balance", q_clamped_balance, _clamped_oracle()),
    QuerySpec("events_range_join", q_range, _RANGE_ORACLE),
    QuerySpec("events_gap_detection", q_gap_detection, _GAP_ORACLE),
    QuerySpec("events_interval_union", q_interval_union, _IUNION_ORACLE),
    QuerySpec("profile_gini_impurity", q_gini, _GINI_ORACLE),
]
