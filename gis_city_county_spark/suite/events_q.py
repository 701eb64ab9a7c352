"""Event-stream queries (batch forms of the streaming operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.pyapi import group_median_sql, user_span_features_sql
from gis_city_county_spark.operators.temporal import (
    funnel_stages,
    funnel_stages_sql,
    resample_ffill,
    resample_ffill_sql,
    rolling_features,
    rolling_features_sql,
    time_weighted_avg_sql,
)
from gis_city_county_spark.functions.numeric import dec_sum, dec_sum_sql
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.streaming.events import (
    hopping_window_agg,
    sessionize,
    sessionize_sql,
    windowed_agg,
)
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


def q_wow_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week traffic report: events + distinct actives per
    ISO week, with absolute delta and basis-point change vs the prior
    week (exact integral arithmetic — `div` twins HUGEINT `//`).
    The growth-dashboard staple. The window runs over the already-
    aggregated |weeks|-row frame, so the single-partition lag is on
    dozens of rows, not the event stream."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    # week stays TIMESTAMP: Spark DATE and DuckDB DATE round-trip
    # differently through pandas (date object vs datetime64), so the
    # suite convention is timestamp-typed calendar buckets.
    weekly = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    w = Window.orderBy("week")
    return (
        weekly.withColumn("__prev", F.lag("n_events").over(w))
        .select(
            "week",
            "n_events",
            "n_users",
            (F.col("n_events") - F.col("__prev")).alias("delta_events"),
            F.when(
                F.col("__prev") > 0,
                F.expr(
                    "(CAST(n_events AS DECIMAL(38,0)) - __prev) * 10000 div __prev"
                ).cast("long"),
            ).alias("change_bp"),
        )
        .orderBy("week")
    )


_WOW_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
weekly AS (
  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
  FROM ev GROUP BY 1
)
SELECT week, n_events, n_users,
       n_events - LAG(n_events) OVER (ORDER BY week) AS delta_events,
       CASE WHEN LAG(n_events) OVER (ORDER BY week) > 0 THEN
         CAST((CAST(n_events AS HUGEINT) - LAG(n_events) OVER (ORDER BY week))
              * 10000 // LAG(n_events) OVER (ORDER BY week) AS BIGINT)
       END AS change_bp
FROM weekly ORDER BY week
"""


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: per-user event-type transition
    counts and probabilities in exact parts-per-million (`div` ==
    HUGEINT `//`). One (user, ts) window pass to pair each event with
    its successor, then a tiny |types|² aggregation — the journey-
    analysis / next-action-model shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc()
    )
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("__from_total"))
    return (
        trans.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div __from_total AS BIGINT)").alias(
                "prob_ppm"
            ),
        )
        .orderBy("from_type", "to_type")
    )


_MARKOV_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
trans AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
           ) AS to_type
    FROM ev
  ) WHERE to_type IS NOT NULL GROUP BY 1, 2
),
totals AS (SELECT from_type, SUM(n) AS from_total FROM trans GROUP BY 1)
SELECT t.from_type, t.to_type, t.n,
       CAST(CAST(t.n AS HUGEINT) * 1000000 // tt.from_total AS BIGINT) AS prob_ppm
FROM trans t JOIN totals tt USING (from_type)
ORDER BY t.from_type, t.to_type
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted per-user mean of the piecewise-constant value
    signal (operators.temporal.time_weighted_avg) — the irregular-
    sampling rollup a plain AVG gets wrong."""
    from gis_city_county_spark.operators.temporal import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev, "user_id", "ts", "value")


def q_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas-UDF surface: exact lower median of event
    value per event type (operators.pyapi.group_median)."""
    from gis_city_county_spark.operators.pyapi import group_median

    ev = load_table(spark, sf_dir, "events")
    return group_median(ev, "event_type", "value")


def q_drift_excursion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift scan: per-user max upward excursion of the
    cumulative deviation-from-mean of event values
    (operators.temporal.drift_excursion) — level-shift detection with
    exact scaled-integer arithmetic."""
    from gis_city_county_spark.operators.temporal import drift_excursion

    ev = load_table(spark, sf_dir, "events")
    return drift_excursion(ev, "user_id", "ts", "value")


def _drift_oracle() -> str:
    from gis_city_county_spark.operators.temporal import drift_excursion_sql

    return drift_excursion_sql(_EV_CTE, "user_id", "ts", "value")


_DRIFT_ORACLE = _drift_oracle()


def q_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day (the WAU-by-day engagement
    curve): each (user, active-day) pair contributes to the 7 report
    days it trails into — a bounded explode (×7) on the *distinct*
    day-user relation, then one distinct-count per report day. No
    range self-join, no O(days²) window."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    spread = days.select(
        "user_id", "day", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("__off")
    ).select(
        "user_id",
        F.timestamp_add("DAY", F.col("__off"), F.col("day")).alias("report_day"),
    )
    return (
        spread.groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("report_day")
    )


_ROLLING_ACTIVES_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
spread AS (
  SELECT user_id, day + o.off * INTERVAL 1 DAY AS report_day
  FROM days, LATERAL (SELECT UNNEST(generate_series(0, 6)) AS off) o
)
SELECT report_day, COUNT(DISTINCT user_id) AS wau
FROM spread GROUP BY 1 ORDER BY 1
"""


def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete per-type quantile report of event values
    (operators.profile.group_quantiles) — the calibration-report
    shape; actual input values, no interpolation."""
    from gis_city_county_spark.operators.profile import group_quantiles

    ev = load_table(spark, sf_dir, "events")
    return group_quantiles(ev, "event_type", "value")


def _gq_oracle() -> str:
    from gis_city_county_spark.operators.profile import group_quantiles_sql

    return group_quantiles_sql(_EV_CTE, "event_type", "value")


_GQ_ORACLE = _gq_oracle()


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational sweep-line: peak concurrent 30-minute sessions per
    day (operators.temporal.peak_concurrency) — +1/−1 open/close
    events, day-partitioned running sum, exact integers."""
    from gis_city_county_spark.operators.temporal import peak_concurrency

    ev = load_table(spark, sf_dir, "events")
    return peak_concurrency(ev, "ts", 1800)


def _concurrency_oracle() -> str:
    from gis_city_county_spark.operators.temporal import peak_concurrency_sql

    return peak_concurrency_sql(_EV_CTE, "ts", 1800)


_CONCURRENCY_ORACLE = _concurrency_oracle()


_PATH_K = 15


def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey mining: the 15 most common 3-step event-type paths
    across user timelines (two lead windows over one (user, ts)
    ordering — a single sort-window pass, then a tiny |types|³-bounded
    aggregation; top-k as TakeOrderedAndProject)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")).asc(), F.col("event_id").asc()
    )
    tri = ev.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    return (
        tri.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "s1", "s2", "s3")
        .limit(_PATH_K)
    )


_PATH_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
tri AS (
  SELECT event_type AS s1,
         LEAD(event_type, 1) OVER w AS s2,
         LEAD(event_type, 2) OVER w AS s3
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
)
SELECT s1, s2, s3, COUNT(*) AS n
FROM tri WHERE s3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, s1, s2, s3 LIMIT {_PATH_K}
"""


_ANOM_K = 20


def q_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted volume anomalies: each (day, hour) bucket
    scored against the corpus-wide hour-of-day baseline —
    ``ratio_ppm = observed·n_days·10⁶ div hour_total`` (10⁶ = exactly
    the baseline share for that hour) — top 20 deviations. Two keyed
    aggregations + a 24-row broadcast margin; exact integer scoring
    (`div` == `//`), day count via a 1-row broadcast."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    buckets = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").alias("hour"),
    )
    per = buckets.groupBy("day", "hour").agg(F.count(F.lit(1)).alias("n"))
    hourly = buckets.groupBy("hour").agg(F.count(F.lit(1)).alias("hour_total"))
    days = buckets.select("day").distinct().agg(F.count(F.lit(1)).alias("n_days"))
    return (
        per.join(F.broadcast(hourly), "hour")
        .crossJoin(F.broadcast(days))
        .select(
            "day",
            "hour",
            "n",
            "hour_total",
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * n_days * 1000000)"
                " div hour_total AS BIGINT)"
            ).alias("ratio_ppm"),
        )
        .orderBy(
            F.abs(F.col("ratio_ppm") - 1_000_000).desc(), "day", "hour"
        )
        .limit(_ANOM_K)
    )


_ANOM_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
buckets AS (SELECT date_trunc('day', ts) AS day, hour(ts) AS hour FROM ev),
per AS (SELECT day, hour, COUNT(*) AS n FROM buckets GROUP BY 1, 2),
hourly AS (SELECT hour, COUNT(*) AS hour_total FROM buckets GROUP BY 1),
days AS (SELECT COUNT(DISTINCT day) AS n_days FROM buckets)
SELECT per.day, per.hour, per.n, hourly.hour_total,
       CAST((CAST(per.n AS HUGEINT) * days.n_days * 1000000)
            // hourly.hour_total AS BIGINT) AS ratio_ppm
FROM per JOIN hourly USING (hour) CROSS JOIN days
ORDER BY abs(ratio_ppm - 1000000) DESC, per.day, per.hour
LIMIT {_ANOM_K}
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (event_type, hour) bar with open/high/
    low/close of the value series — the financial-style resample. Open
    and close are picked by integer-coded argmin/argmax over
    ``(epoch_us, event_id)`` (a total order, so ties cannot diverge
    between engines), making the whole bar a single map-side-
    combinable aggregation — no window, no sort."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar"),
        F.struct(
            F.unix_micros(F.col("ts")).alias("us"),
            F.col("event_id"),
            F.col("value"),
        ).alias("pt"),
        "value",
    )
    return (
        src.groupBy("event_type", "bar")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pt").getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max("pt").getField("value").alias("close"),
        )
        .orderBy("event_type", "bar")
    )


_OHLC_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
src AS (
  SELECT event_type, date_trunc('hour', ts) AS bar,
         epoch_us(ts) AS us, event_id, value
  FROM ev
),
ranked AS (
  SELECT event_type, bar, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, bar
                            ORDER BY us ASC, event_id ASC) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY event_type, bar
                            ORDER BY us DESC, event_id DESC) AS rn_close
  FROM src
)
SELECT event_type, bar,
       COUNT(*) AS n,
       MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_close = 1 THEN value END) AS close
FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-design probe: how late do events arrive? Each event's
    lateness is the running maximum event-time seen so far (in arrival
    order) minus its own event-time; the audit reports, per event
    type, how many events a 0s / 60s / 600s watermark would drop and
    the worst lateness observed. The synthetic stream is stored in
    perfect time order, so arrival order is simulated as the md5 of
    the event id (a deterministic shuffle — the adversarial ingest).
    One global arrival-order window (a stream is one arrival sequence
    by definition; at scale this runs per ingest partition), then a
    tiny keyed aggregation. Exact integer microseconds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.orderBy(F.md5(F.col("event_id").cast("string")).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lat = ev.select(
        "event_type",
        (F.max(us).over(w) - us).alias("late_us"),
    )
    return (
        lat.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("late_us") > 0).alias("n_out_of_order"),
            F.count_if(F.col("late_us") > 60_000_000).alias("n_late_60s"),
            F.count_if(F.col("late_us") > 600_000_000).alias("n_late_600s"),
            F.max("late_us").alias("max_late_us"),
        )
        .orderBy("event_type")
    )


_LATENESS_ORACLE = f"""
WITH ev AS (SELECT event_id, event_type, epoch_us(make_timestamp(epoch_us(ts))) AS us
            FROM events),
lat AS (
  SELECT event_type,
         MAX(us) OVER (ORDER BY md5(CAST(event_id AS VARCHAR)) ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us
           AS late_us
  FROM ev
)
SELECT event_type, COUNT(*) AS n,
       CAST(COUNT(*) FILTER (WHERE late_us > 0) AS BIGINT) AS n_out_of_order,
       CAST(COUNT(*) FILTER (WHERE late_us > 60000000) AS BIGINT) AS n_late_60s,
       CAST(COUNT(*) FILTER (WHERE late_us > 600000000) AS BIGINT) AS n_late_600s,
       MAX(late_us) AS max_late_us
FROM lat GROUP BY 1 ORDER BY 1
"""


_TWA_ORACLE = time_weighted_avg_sql(_EV_CTE, "user_id", "ts", "value")
_MEDIAN_ORACLE = group_median_sql(_EV_CTE, "event_type", "value")


def q_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window per-type volume: 15-minute windows sliding every
    5 minutes (each event in 3 windows) — the streaming-compatible
    overlapping-window aggregate next to the tumbling one."""
    events = load_table(spark, sf_dir, "events")
    return hopping_window_agg(events, "15 minutes", "5 minutes")


# Spark aligns hopping windows to epoch multiples of the slide: an
# event at microsecond t is in the 3 windows starting at
# (t//s)*s − {2s, s, 0} for w=900s, s=300s. Mirrored in integer µs.
_HOPPING_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
wins AS (
  SELECT make_timestamp(g.st) AS window_start, event_type, value
  FROM ev, LATERAL UNNEST(generate_series(
      (epoch_us(ts) // 300000000) * 300000000 - 600000000,
      (epoch_us(ts) // 300000000) * 300000000,
      300000000)) AS g(st)
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events,
       {dec_sum_sql("value", "total_value")}
FROM wins GROUP BY 1, 2
"""


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via Spark's native ``session_window`` (the
    exact aggregate Structured Streaming runs with a watermark):
    session start/end, event count, decimal-exact value sum. The
    lag-window ``sessionize`` operator is this query's batch oracle
    twin."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw.alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        )
    )


# session_window merge rule: an event extends the session iff
# ts − last_ts < gap (strictly); equality starts a NEW session —
# hence `>=` in the island flag, unlike sessionize's `>` convention.
_SESSION_NATIVE_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
flagged AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT user_id, value, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
           ROWS UNBOUNDED PRECEDING) AS sidx
  FROM flagged
)
SELECT user_id,
       strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(make_timestamp(MAX(us) + 1800000000), '%Y-%m-%d %H:%M:%S')
         AS session_end,
       COUNT(*) AS n_events,
       {dec_sum_sql("value", "total_value")}
FROM sessions GROUP BY user_id, sidx
"""


def q_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow witness: per-type event-value stats
    computed with pyarrow kernels on the whole group (no pandas),
    restricted to order-independent outputs so the result is exact."""
    from gis_city_county_spark.operators.pyapi import arrow_group_stats

    ev = load_table(spark, sf_dir, "events")
    return arrow_group_stats(ev, "event_type", "value")


def _arrow_group_oracle() -> str:
    from gis_city_county_spark.operators.pyapi import arrow_group_stats_sql

    return arrow_group_stats_sql(
        "SELECT event_type, value FROM events", "event_type", "value"
    )


def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: consecutive
    gaps (lag over the total (ts, event_id) order per type) bucketed
    into power-of-two second bands — the traffic-shape scan behind
    capacity models and anomaly baselines. All integer arithmetic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select("event_type", "ts", "event_id")
        .withColumn("__us", F.unix_micros("ts"))
        .withColumn("__prev", F.lag("__us").over(w))
        # integer div: `/` would go through double and Spark/DuckDB
        # round the long cast differently
        .withColumn("__gap_s", F.expr("(__us - __prev) div 1000000"))
        .filter(F.col("__gap_s").isNotNull())
    )
    band = F.when(F.col("__gap_s") <= 0, -1).otherwise(
        F.floor(F.log2("__gap_s")).cast("long")
    )
    return (
        gaps.withColumn("band", band)
        .groupBy("event_type", "band")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("__gap_s").alias("min_gap_s"),
            F.max("__gap_s").alias("max_gap_s"),
        )
    )


_INTERARRIVAL_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
gaps AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY event_type ORDER BY ts, event_id)) // 1000000
           AS gap_s
  FROM ev
)
SELECT event_type,
       CASE WHEN gap_s <= 0 THEN -1
            ELSE CAST(FLOOR(log2(gap_s)) AS BIGINT) END AS band,
       COUNT(*) AS n_gaps,
       MIN(gap_s) AS min_gap_s, MAX(gap_s) AS max_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1, 2
"""


def q_ab_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split 50/50 into control/
    treatment (md5 — assignment survives reruns and re-partitioning),
    per-event-type decimal-exact means per arm and the uplift
    difference. The experimentation primitive every product pipeline
    ships."""
    from gis_city_county_spark.functions.numeric import dec_avg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "arm",
        F.expr(
            "CASE WHEN cast(conv(substring(md5(cast(user_id as string)), 25, 8),"
            " 16, 10) as bigint) % 2 = 0 THEN 'control' ELSE 'treatment' END"
        ),
    )
    per_arm = ev.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).alias("n"), dec_avg(F.col("value"), "mean_value")
    )
    c = per_arm.filter(F.col("arm") == "control").select(
        "event_type",
        F.col("n").alias("n_control"),
        F.col("mean_value").alias("mean_control"),
    )
    t = per_arm.filter(F.col("arm") == "treatment").select(
        "event_type",
        F.col("n").alias("n_treatment"),
        F.col("mean_value").alias("mean_treatment"),
    )
    return c.join(t, "event_type").withColumn(
        "uplift", F.col("mean_treatment") - F.col("mean_control")
    )


def _ab_uplift_oracle() -> str:
    from gis_city_county_spark.functions.numeric import dec_avg_sql

    return f"""
WITH ev AS (
  SELECT event_type, value,
         CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 25, 8))::BIGINT
                   % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
  FROM events
),
per_arm AS (
  SELECT event_type, arm, COUNT(*) AS n, {dec_avg_sql("value", "mean_value")}
  FROM ev GROUP BY 1, 2
)
SELECT c.event_type, c.n AS n_control, c.mean_value AS mean_control,
       t.n AS n_treatment, t.mean_value AS mean_treatment,
       t.mean_value - c.mean_value AS uplift
FROM per_arm c JOIN per_arm t USING (event_type)
WHERE c.arm = 'control' AND t.arm = 'treatment'
"""


def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (the
    engagement metric): distinct active days → islands via the
    day − row_number trick → max island length, plus total active
    days. All integer arithmetic, windows partitioned by user."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.floor(F.unix_micros("ts") / 86_400_000_000).cast("long").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "grp", F.col("day") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
    )


_STREAK_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM ev
),
islands AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, COUNT(*) AS len FROM islands GROUP BY 1, 2
)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM streaks GROUP BY user_id
"""


def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts + the running cumulative-distinct-user
    curve — first-seen-day rewrite, so the 'distinct ever' window is
    one min-aggregate and a calendar-bounded running sum."""
    from gis_city_county_spark.operators.temporal import cumulative_distinct

    ev = load_table(spark, sf_dir, "events")
    return cumulative_distinct(ev, "user_id", "ts")


def _cumulative_distinct_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        cumulative_distinct_sql,
    )

    return cumulative_distinct_sql("SELECT * FROM events", "user_id", "ts")


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement per event type (one halving per
    elapsed week against a fixed horizon) — exact dyadic weights,
    zero transcendental functions, all-integer outputs."""
    from gis_city_county_spark.operators.temporal import decayed_engagement

    ev = load_table(spark, sf_dir, "events")
    return decayed_engagement(
        ev, "event_type", "ts", "value", horizon="2024-01-31"
    )


def _decayed_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        decayed_engagement_sql,
    )

    return decayed_engagement_sql(
        "SELECT * FROM events", "event_type", "ts", "value",
        horizon="2024-01-31",
    )


def q_seasonal_baseline(spark, sf_dir):
    """Day-of-week x hour median baseline over the full calendar grid
    with the top-20 absolute-deviation anomaly cells."""
    from gis_city_county_spark.operators.temporal import seasonal_baseline

    events = load_table(spark, sf_dir, "events")
    return seasonal_baseline(events, "ts", top_k=20)


def _seasonal_oracle() -> str:
    from gis_city_county_spark.operators.temporal import seasonal_baseline_sql

    return seasonal_baseline_sql("SELECT * FROM events", "ts", top_k=20)


def q_concentration(spark, sf_dir):
    """Lorenz-curve activity concentration over event users: 10 rank
    bands with exact ppm shares and the Gini coefficient riding from
    the same exact moments."""
    from gis_city_county_spark.operators.profile import concentration_profile

    events = load_table(spark, sf_dir, "events")
    return concentration_profile(events, "user_id", n_bands=10)


def _concentration_oracle() -> str:
    from gis_city_county_spark.operators.profile import (
        concentration_profile_sql,
    )

    return concentration_profile_sql(
        "SELECT * FROM events", "user_id", n_bands=10
    )


def q_stickiness(spark, sf_dir):
    """DAU/MAU28 stickiness per report day over events (see
    operators.temporal.stickiness_report)."""
    from gis_city_county_spark.operators.temporal import stickiness_report

    ev = load_table(spark, sf_dir, "events")
    return stickiness_report(ev, "user_id", "ts", window_days=28)


_STICKINESS_ORACLE = f"""
WITH ev AS ({_EV_CTE}),
days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
dau AS (
  SELECT day AS report_day, COUNT(DISTINCT user_id) AS dau
  FROM days GROUP BY 1
),
spread AS (
  SELECT user_id, day + o.off * INTERVAL 1 DAY AS report_day
  FROM days, LATERAL (SELECT UNNEST(generate_series(0, 27)) AS off) o
),
mau AS (
  SELECT report_day, COUNT(DISTINCT user_id) AS mau28
  FROM spread GROUP BY 1
)
SELECT d.report_day, CAST(d.dau AS BIGINT) AS dau,
       CAST(m.mau28 AS BIGINT) AS mau28,
       CAST((1000000 * d.dau) // m.mau28 AS BIGINT) AS stickiness_ppm
FROM dau d JOIN mau m USING (report_day)
"""


def q_conversion_latency(spark, sf_dir):
    """Signup-to-first-purchase latency quantiles by signup-month
    cohort (operators.temporal.conversion_latency +
    profile.group_quantiles)."""
    from gis_city_county_spark.operators.profile import group_quantiles
    from gis_city_county_spark.operators.temporal import conversion_latency

    ev = load_table(spark, sf_dir, "events")
    lat = conversion_latency(
        ev, "user_id", "ts", "event_type", "signup", "purchase"
    )
    return group_quantiles(lat, "cohort_month", "latency_sec")


def _conversion_latency_oracle() -> str:
    from gis_city_county_spark.operators.profile import group_quantiles_sql

    inner = f"""
WITH ev AS ({_EV_CTE}),
s AS (
  SELECT user_id, MIN(ts) AS sts FROM ev
  WHERE event_type = 'signup' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS pts, MIN(s.sts) AS sts
  FROM ev e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.sts
  GROUP BY 1
)
SELECT date_trunc('month', sts) AS cohort_month,
       CAST((epoch_us(pts) - epoch_us(sts)) // 1000000 AS BIGINT)
         AS latency_sec
FROM p
"""
    return group_quantiles_sql(
        f"({inner})", "cohort_month", "latency_sec"
    )


def q_hazard_table(spark, sf_dir):
    """Discrete-time churn hazard life table over events: per
    lifetime day-index, at-risk / churned / censored counts and the
    exact-ppm hazard (see operators.temporal.hazard_table)."""
    from gis_city_county_spark.operators.temporal import hazard_table

    ev = load_table(spark, sf_dir, "events")
    return hazard_table(ev, "user_id", "ts", churn_gap_days=7)


def _hazard_oracle() -> str:
    from gis_city_county_spark.operators.temporal import hazard_table_sql

    return hazard_table_sql(f"({_EV_CTE})", "user_id", "ts",
                            churn_gap_days=7)


def q_mad_anomalies(spark, sf_dir):
    """MAD-based daily-volume anomaly flags over events (exact
    lower-median convention, zero-filled calendar; see
    operators.temporal.daily_mad_anomalies)."""
    from gis_city_county_spark.operators.temporal import daily_mad_anomalies

    ev = load_table(spark, sf_dir, "events")
    return daily_mad_anomalies(ev, "ts", k_milli=3500)


def _mad_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        daily_mad_anomalies_sql,
    )

    return daily_mad_anomalies_sql(f"({_EV_CTE})", "ts", k_milli=3500)



def q_growth_accounting(spark, sf_dir):
    """Weekly new/retained/resurrected/churned growth accounting over
    events (see operators.temporal.growth_accounting); the identity
    active(w) = active(w-1) + new + resurrected - churned is pinned
    by test."""
    from gis_city_county_spark.operators.temporal import growth_accounting

    ev = load_table(spark, sf_dir, "events")
    return growth_accounting(ev, "user_id", "ts")


def _growth_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        growth_accounting_sql,
    )

    return growth_accounting_sql(f"({_EV_CTE})", "user_id", "ts")



def q_trend_test(spark, sf_dir):
    """Mann-Kendall trend + Sen slope over daily event volume: exact
    S / tie-corrected variance, one fixed IEEE z tail, lower-median
    milli slope (see operators.temporal.trend_test)."""
    from gis_city_county_spark.operators.temporal import trend_test

    ev = load_table(spark, sf_dir, "events")
    return trend_test(ev, "ts")


def _trend_oracle() -> str:
    from gis_city_county_spark.operators.temporal import trend_test_sql

    return trend_test_sql(f"({_EV_CTE})", "ts")


def q_seasonal_naive(spark, sf_dir):
    """Seasonal-naive (lag-7) forecast backtest over daily volume:
    exact WAPE ppm + MAE milli (see
    operators.temporal.seasonal_naive_backtest)."""
    from gis_city_county_spark.operators.temporal import (
        seasonal_naive_backtest,
    )

    ev = load_table(spark, sf_dir, "events")
    return seasonal_naive_backtest(ev, "ts", period_days=7)


def _seasonal_naive_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        seasonal_naive_backtest_sql,
    )

    return seasonal_naive_backtest_sql(f"({_EV_CTE})", "ts", period_days=7)


def q_km_curve(spark, sf_dir):
    """Kaplan-Meier survival CURVE over the hazard life table: per
    lifetime day-index the running product of (1 − churned/at_risk),
    folded in canonical day order so both engines bit-match (see
    operators.temporal.km_curve)."""
    from gis_city_county_spark.operators.temporal import km_curve

    ev = load_table(spark, sf_dir, "events")
    return km_curve(ev, "user_id", "ts", churn_gap_days=7)


def _km_curve_oracle() -> str:
    from gis_city_county_spark.operators.temporal import km_curve_sql

    return km_curve_sql(f"({_EV_CTE})", "user_id", "ts", churn_gap_days=7)


def q_cusum_changepoint(spark, sf_dir):
    """CUSUM level-shift screen over zero-filled daily event volume:
    exact-integer scaled cumulative deviations, argmax |cusum| flag
    (see operators.temporal.cusum_changepoint)."""
    from gis_city_county_spark.operators.temporal import cusum_changepoint

    ev = load_table(spark, sf_dir, "events")
    return cusum_changepoint(ev, "ts")


def _cusum_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        cusum_changepoint_sql,
    )

    return cusum_changepoint_sql(f"({_EV_CTE})", "ts")


def q_pettitt_changepoint(spark, sf_dir):
    """Pettitt rank-based changepoint over zero-filled daily event
    volume: sign-relation statistic via the distinct-value cells and
    the U_t recurrence — never the day-pair relation (see
    operators.temporal.pettitt_changepoint)."""
    from gis_city_county_spark.operators.temporal import (
        pettitt_changepoint,
    )

    ev = load_table(spark, sf_dir, "events")
    return pettitt_changepoint(ev, "ts")


def _pettitt_oracle() -> str:
    from gis_city_county_spark.operators.temporal import (
        pettitt_changepoint_sql,
    )

    return pettitt_changepoint_sql(f"({_EV_CTE})", "ts")


def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on above/below-median daily volume:
    exact lower-median reference, one lag over the calendar-bounded
    day order, exact-integer z numerators (see
    operators.temporal.runs_test)."""
    from gis_city_county_spark.operators.temporal import runs_test

    ev = load_table(spark, sf_dir, "events")
    return runs_test(ev, "ts")


def _runs_oracle() -> str:
    from gis_city_county_spark.operators.temporal import runs_test_sql

    return runs_test_sql(f"({_EV_CTE})", "ts")


SPECS = [
    QuerySpec("events_conversion_latency", q_conversion_latency,
              _conversion_latency_oracle()),
    QuerySpec("events_stickiness", q_stickiness, _STICKINESS_ORACLE),
    QuerySpec("events_hazard_table", q_hazard_table, _hazard_oracle()),
    QuerySpec("events_mad_anomalies", q_mad_anomalies, _mad_oracle()),
    QuerySpec("events_km_curve", q_km_curve, _km_curve_oracle()),
    QuerySpec("events_cusum_changepoint", q_cusum_changepoint,
              _cusum_oracle()),
    QuerySpec("events_trend_test", q_trend_test, _trend_oracle()),
    QuerySpec("events_pettitt_changepoint", q_pettitt_changepoint,
              _pettitt_oracle()),
    QuerySpec("events_runs_test", q_runs_test, _runs_oracle()),
    QuerySpec("events_seasonal_naive", q_seasonal_naive,
              _seasonal_naive_oracle()),
    QuerySpec("events_growth_accounting", q_growth_accounting,
              _growth_oracle()),
    QuerySpec("profile_concentration", q_concentration,
              _concentration_oracle()),
    QuerySpec("events_seasonal_baseline", q_seasonal_baseline,
              _seasonal_oracle()),
    QuerySpec("events_windowed_agg", q_windowed, _WINDOWED_ORACLE),
    QuerySpec("events_cumulative_distinct", q_cumulative_distinct,
              _cumulative_distinct_oracle()),
    QuerySpec("events_decayed_engagement", q_decayed_engagement,
              _decayed_oracle()),
    QuerySpec("events_activity_streaks", q_activity_streaks, _STREAK_ORACLE),
    QuerySpec("events_interarrival_histogram", q_interarrival, _INTERARRIVAL_ORACLE),
    QuerySpec("eval_ab_uplift", q_ab_uplift, _ab_uplift_oracle()),
    QuerySpec("pyapi_arrow_group_stats", q_arrow_group_stats, _arrow_group_oracle()),
    QuerySpec("events_hopping_window", q_hopping, _HOPPING_ORACLE),
    QuerySpec("events_session_window_native", q_session_window_native, _SESSION_NATIVE_ORACLE),
    QuerySpec("events_sessionize", q_sessionize, sessionize_sql(_EV_CTE, 1800)),
    QuerySpec("events_funnel_stages", q_funnel, _FUNNEL_ORACLE),
    QuerySpec("events_rolling_features", q_rolling, _ROLLING_ORACLE),
    QuerySpec("events_resample_ffill", q_resample, _RESAMPLE_ORACLE),
    QuerySpec("events_cohort_retention", q_cohort_retention, _COHORT_ORACLE),
    QuerySpec("pyapi_user_span_features", q_user_span_features, _SPAN_ORACLE),
    QuerySpec("events_wow_report", q_wow_report, _WOW_ORACLE),
    QuerySpec("events_markov_transitions", q_markov_transitions, _MARKOV_ORACLE),
    QuerySpec("events_time_weighted_avg", q_time_weighted_avg, _TWA_ORACLE),
    QuerySpec("pyapi_group_median", q_group_median, _MEDIAN_ORACLE),
    QuerySpec("events_drift_excursion", q_drift_excursion, _DRIFT_ORACLE),
    QuerySpec("events_rolling_actives", q_rolling_actives, _ROLLING_ACTIVES_ORACLE),
    QuerySpec("profile_group_quantiles", q_group_quantiles, _GQ_ORACLE),
    QuerySpec("events_peak_concurrency", q_peak_concurrency, _CONCURRENCY_ORACLE),
    QuerySpec("events_path_trigrams", q_path_trigrams, _PATH_ORACLE),
    QuerySpec("events_hourly_anomalies", q_hourly_anomalies, _ANOM_ORACLE),
    QuerySpec("events_ohlc_bars", q_ohlc_bars, _OHLC_ORACLE),
    QuerySpec("events_lateness_audit", q_lateness_audit, _LATENESS_ORACLE),
]
