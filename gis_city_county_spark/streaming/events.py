"""Event-stream operators: windowed aggregation and sessionization.

The reference is pure batch (SURVEY.md §1: no streams), so these are
capability extensions over the driver's ``events`` table. Each
operator has a batch form (oracle-testable) and a Structured
Streaming form built from the same logic — batch `windowed_agg` is
exactly the aggregation you'd put behind ``readStream`` +
``withWatermark``.

All time arithmetic uses integer microseconds (``unix_micros``), so
gap/window comparisons are exact and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gis_city_county_spark.functions.numeric import dec_sum


def windowed_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count/sum per key. Batch form of the streaming
    ``groupBy(window(ts, d), key)`` aggregate; one shuffle on
    (window, key) with map-side partial aggregation."""
    win = F.window(ts_col, window_duration)
    return (
        events.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the user's previous event exceeds ``gap_seconds``.

    Classic window formulation — lag → gap flag → running sum of
    flags = session index — one shuffle on the user key, everything
    else within-partition. The streaming twin is
    ``session_window(ts, gap)``; this batch form is its oracle."""
    us = F.unix_micros(F.col(ts_col))
    w_order = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    flagged = (
        events.withColumn("__us", us)
        .withColumn("__prev", F.lag("__us").over(w_order))
        .withColumn(
            "__new_session",
            (F.col("__prev").isNull())
            | ((F.col("__us") - F.col("__prev")) > gap_seconds * 1_000_000),
        )
        .withColumn(
            "session_idx",
            F.sum(F.col("__new_session").cast("long")).over(
                w_order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        flagged.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "session_value"),
            ((F.max("__us") - F.min("__us")) / F.lit(1_000_000.0)).alias("duration_sec"),
        )
    )


def sessionize_sql(
    table_cte: str,
    gap_seconds: int = 1800,
) -> str:
    """DuckDB oracle twin of :func:`sessionize` (expects a CTE named
    ``ev`` with columns user_id, event_id, ts, value)."""
    return f"""
WITH ev AS ({table_cte}),
flagged AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_seconds} * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, value, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
         AS session_value,
       (MAX(us) - MIN(us)) / 1000000.0 AS duration_sec
FROM sessions
GROUP BY user_id, session_idx
"""


def streaming_windowed_agg(
    spark,
    schema,
    path: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Structured Streaming form: file source → watermark → windowed
    aggregate. Returns the streaming DataFrame (caller starts the
    query; tests use the memory sink + processAllAvailable)."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )


def streaming_hopping_window_agg(
    spark,
    schema,
    path: str,
    window_duration: str = "15 minutes",
    slide_duration: str = "5 minutes",
    watermark: str = "2 hours",
):
    """Structured Streaming twin of :func:`hopping_window_agg`: the
    same ``window(ts, w, s)`` expression under a watermark — state per
    (window, key) evicts once the watermark passes window end."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration, slide_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )


def streaming_sessionize(
    spark,
    schema,
    path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Structured Streaming twin of :func:`sessionize`:
    ``session_window`` merges events closer than ``gap`` into one
    growing window per user. State is scoped per (user, session
    window) and dropped once the watermark passes the session end —
    bounded memory on an unbounded stream."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
    )


def streaming_dedup(
    spark,
    schema,
    path: str,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "2 hours",
):
    """Streaming exact dedup: keep the first event per key, with state
    bounded by the watermark (``dropDuplicatesWithinWatermark`` drops
    a key's state once the watermark passes its last-seen timestamp —
    the streaming form of the batch ``dropDuplicates``, and the only
    form whose state doesn't grow without bound on an infinite
    stream). On a 100 TB/day stream the state store shards by key
    hash across executors; the watermark horizon bounds each shard."""
    stream = spark.readStream.schema(schema).parquet(path)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stateful_user_totals(
    spark,
    schema,
    path: str,
):
    """Custom stateful operator via ``applyInPandasWithState``:
    per-user running event count + value total maintained in explicit
    GroupState across micro-batches (the escape hatch for stateful
    logic ``session_window`` can't express — e.g. cross-session
    lifetime counters). Arrow-batched; state is one small tuple per
    key, so a 100 TB stream shards by user across executors."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    stream = spark.readStream.schema(schema).parquet(path)
    return stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "Update", GroupStateTimeout.NoTimeout
    )


def streaming_interval_join(
    spark,
    schema,
    path: str,
    lower_seconds: int = -600,
    upper_seconds: int = 0,
    watermark: str = "2 hours",
):
    """Stream-stream interval join: (error, click) pairs per user with
    the click inside ``[error_ts + lower, error_ts + upper]`` — the
    Structured Streaming twin of :func:`operators.temporal.range_join`.

    Both sides carry a watermark AND the join has a two-sided time
    bound, which is what lets the state store evict: a buffered click
    can only match errors in a known time band, so once the error-side
    watermark passes ``click_ts + |lower|`` the row is dropped. With
    only a watermark (no range condition) stream-stream join state
    grows forever — the range bound is load-bearing, not an
    optimization."""
    errors = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    clicks = (
        spark.readStream.schema(schema)
        .parquet(path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("err_ts") + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (F.col("click_ts") <= F.col("err_ts") + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return errors.join(clicks, cond, "inner").select(
        "err_id", "user_id", "err_ts", "click_id", "click_ts", "click_value"
    )


def streaming_cdc_apply(
    spark,
    schema,
    changes_path: str,
    publish_dir: str,
    name: str,
    key_cols: tuple[str, ...],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    max_files_per_trigger: int = 1,
):
    """Streaming CDC apply: a change-record stream continuously merged
    into a published blue/green snapshot via ``foreachBatch`` — the
    streaming twin of :func:`operators.cdc.merge_upsert` and the
    standard "keep a serving table fresh from a change feed" pattern.

    Per micro-batch: (1) reduce the batch to the LATEST change per key
    by ``seq_col`` (a globally monotone change sequence — a CDC LSN),
    (2) read the CURRENT snapshot, (3) ``merge_upsert``, (4) publish
    the result as a new version and atomically repoint CURRENT
    (:func:`sources.files.publish_snapshot`). Readers never see a
    partial merge, and a crash mid-batch leaves the old pointer
    intact — the batch replays idempotently because applying the same
    latest-per-key change set twice is a no-op.

    Because the per-batch reduction keeps the max-``seq_col`` row per
    key, the final state is independent of how the stream is chopped
    into micro-batches. At scale the snapshot rewrite becomes a
    partition-scoped rewrite (only partitions containing changed keys)
    or a Delta/Iceberg MERGE; the foreachBatch shape is identical.

    Returns a ``DataStreamWriter`` — caller ``.start()``s it.
    """
    from gis_city_county_spark.operators.cdc import merge_upsert
    from gis_city_county_spark.sources.files import publish_snapshot, read_published

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", seq_col)
        )
        base = read_published(sess, publish_dir, name)
        merged = merge_upsert(base, latest, list(key_cols), op_col, delete_op)
        publish_snapshot(merged, publish_dir, name)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(changes_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")


def stateful_user_totals_tws(
    spark,
    schema,
    path: str,
):
    """The Spark-4 arbitrary-state API (``transformWithStateInPandas``)
    form of :func:`stateful_user_totals`: a ``StatefulProcessor`` with
    an explicit ``ValueState`` per user. Compared to
    ``applyInPandasWithState`` this is the successor surface — typed
    state handles (value/list/map), timers, and TTL — backed by the
    RocksDB state store, which is also what bounds memory on a 100 TB
    stream (state spills to local disk + changelog-checkpoints to the
    cluster store instead of living on the JVM heap)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    stream = spark.readStream.schema(schema).parquet(path)
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def hopping_window_agg(
    events: DataFrame,
    window_duration: str = "15 minutes",
    slide_duration: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Hopping (sliding) window count/sum per key: each event lands in
    ``window/slide`` overlapping windows. Batch form of the streaming
    ``groupBy(window(ts, w, s), key)`` aggregate — identical code runs
    under ``readStream`` with a watermark.

    Scale shape: Spark expands each row to its covering windows
    *before* the aggregation (an internal explode by w/s), then one
    shuffle on (window, key) with map-side partial agg — shuffle
    volume is ``w/s ×`` the tumbling case, which is why production
    hopping windows keep the ratio small and derive finer views by
    re-aggregating tumbling panes instead."""
    win = F.window(ts_col, window_duration, slide_duration)
    return (
        events.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def streaming_enrich(
    spark,
    schema,
    path: str,
    dim: DataFrame,
    key_col: str = "user_id",
    dim_key: str = "c_custkey",
    dim_val: str = "c_mktsegment",
):
    """Stream-static enrichment join: the event stream joins a static
    dimension (broadcast — the dim is re-read per micro-batch but
    never enters streaming state; contrast with stream-stream joins
    whose both sides must be watermarked and buffered). The canonical
    "attach user/account attributes to a click stream" shape; output
    = running per-segment counts and value sums."""
    stream = spark.readStream.schema(schema).parquet(path)
    d = dim.select(
        F.col(dim_key).alias(key_col), F.col(dim_val).alias("segment")
    )
    return (
        stream.join(F.broadcast(d), key_col)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
