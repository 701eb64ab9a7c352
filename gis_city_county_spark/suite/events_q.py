"""Event-stream queries (batch forms of the streaming operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gis_city_county_spark.operators.pyapi import user_span_features_sql
from gis_city_county_spark.operators.temporal import (
    funnel_stages,
    funnel_stages_sql,
    resample_ffill,
    resample_ffill_sql,
    rolling_features,
    rolling_features_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.streaming.events import sessionize, sessionize_sql, windowed_agg
from gis_city_county_spark.suite import QuerySpec

# The events table stores TIMESTAMP(NANOS); both engines are floored
# to microseconds first (see sources.tables._load_events).
_EV_CTE = (
    "SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, "
    "event_type, value FROM events"
)


def q_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return windowed_agg(events, "1 hour")


_WINDOWED_ORACLE = f"""
WITH ev AS ({_EV_CTE})
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
         AS total_value
FROM ev
GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(events, gap_seconds=1800)


_FUNNEL = ["signup", "click", "purchase"]


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → click → purchase funnel: per-user stage
    timestamps + deepest stage reached (strict temporal order)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_stages(events, "user_id", "ts", "event_type", _FUNNEL)


_FUNNEL_ORACLE = funnel_stages_sql(
    _EV_CTE, "user_id", "ts", "event_type", _FUNNEL
)


def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-minute per-user activity features on every event
    (count, decimal-exact value sum, gap to previous event)."""
    events = load_table(spark, sf_dir, "events")
    return rolling_features(
        events, "user_id", "ts", "event_id", "value", window_seconds=600
    )


_ROLLING_ORACLE = rolling_features_sql(
    _EV_CTE, "user_id", "ts", "event_id", "value", window_seconds=600
)


def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample of the 'value' series with forward
    fill over empty hours (gap-free feature series)."""
    events = load_table(spark, sf_dir, "events")
    return resample_ffill(
        events, "user_id", "ts", "event_id", "value", step_seconds=3600
    )


_RESAMPLE_ORACLE = resample_ffill_sql(
    _EV_CTE, "user_id", "ts", "event_id", "value", step_seconds=3600
)


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users grouped by first-seen day, counted
    as active per day-offset from that cohort day — the product-
    analytics triangle matrix. Two shuffles (per-user min day, then
    the (cohort, offset) distinct-count); output is bounded by
    days² regardless of event volume."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = days.join(first, "user_id")
    return (
        act.groupBy(
            "cohort_day",
            F.datediff(F.col("day").cast("date"), F.col("cohort_day").cast("date"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


_COHORT_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
SELECT f.cohort_day,
       date_diff('day', CAST(f.cohort_day AS DATE), CAST(d.day AS DATE)) AS day_offset,
       COUNT(DISTINCT d.user_id) AS n_active
FROM days d JOIN first f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_user_span_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas surface: per-user lifetime span features
    (count, first/last micros, max inter-event gap + its index) as an
    Arrow grouped-map state machine, oracle-checked like any native
    operator. Scoped to a user subset — the witness needs the API
    exercised, not every group paying the per-group Python call (the
    production form of this exact feature set is a collect_list +
    vectorized pandas_udf, one call per Arrow batch of groups)."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.pyapi import user_span_features

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    return user_span_features(ev, "user_id", "ts", "value")


_SPAN_ORACLE = user_span_features_sql(
    f"SELECT * FROM ({_EV_CTE}) WHERE user_id % 7 = 0"
)


SPECS = [
    QuerySpec("events_windowed_agg", q_windowed, _WINDOWED_ORACLE),
    QuerySpec("events_sessionize", q_sessionize, sessionize_sql(_EV_CTE, 1800)),
    QuerySpec("events_funnel_stages", q_funnel, _FUNNEL_ORACLE),
    QuerySpec("events_rolling_features", q_rolling, _ROLLING_ORACLE),
    QuerySpec("events_resample_ffill", q_resample, _RESAMPLE_ORACLE),
    QuerySpec("events_cohort_retention", q_cohort_retention, _COHORT_ORACLE),
    QuerySpec("pyapi_user_span_features", q_user_span_features, _SPAN_ORACLE),
]
