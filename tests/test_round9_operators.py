"""Round-9 additions and ADVICE-r8 regression pins."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


# --------------------------------- ADVICE r8: cumulative_distinct NULLs


def test_cumulative_distinct_drops_all_null_ts_keys(spark):
    """A key whose events ALL have NULL timestamps must not emit a
    NULL-day row (Spark windows order NULLs FIRST, DuckDB LAST — the
    running sum would diverge on every row); a key with a mix keeps
    its min non-NULL day.  Spark and the DuckDB twin must agree on
    exactly this fixture."""
    from gis_city_county_spark.operators.temporal import (
        cumulative_distinct,
        cumulative_distinct_sql,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, None),                    # mixed: min skips the NULL
            (2, None),                    # all-NULL key: dropped
            (3, "2024-01-02 09:00:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))

    got = sorted(
        (r["day"].strftime("%Y-%m-%d"), r["n_new"], r["cum_distinct"])
        for r in cumulative_distinct(ev, "user_id", "ts").collect()
    )
    assert got == [("2024-01-01", 1, 1), ("2024-01-02", 1, 2)]

    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    want = sorted(
        (r[0].strftime("%Y-%m-%d"), r[1], r[2])
        for r in con.execute(
            cumulative_distinct_sql("SELECT * FROM ev", "user_id", "ts")
        ).fetchall()
    )
    assert got == want


def test_streaming_distinct_fold_skips_null_days(spark, tmp_path):
    """The streaming fold mirrors the batch NULL-day rule: an all-NULL
    batch contributes nothing to state, and a later real timestamp
    still first-seens the key."""
    from gis_city_county_spark.streaming.distinct import distinct_batch_folder

    state = str(tmp_path / "state")
    curve = str(tmp_path / "curve")
    fold = distinct_batch_folder(state, curve, "user_id", "ts")

    b1 = spark.createDataFrame(
        [(7, None), (8, "2024-01-01 10:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b1, 0)
    rows = {r["cum_distinct"] for r in spark.read.parquet(curve).collect()}
    assert rows == {1}  # only key 8; key 7's NULL day never enters state

    b2 = spark.createDataFrame(
        [(7, "2024-01-02 09:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    fold(b2, 1)
    latest = {
        r["day"].strftime("%Y-%m-%d"): r["cum_distinct"]
        for r in spark.read.parquet(curve)
        .filter(F.col("batch_id") == 1).collect()
    }
    assert latest == {"2024-01-01": 1, "2024-01-02": 2}


# ----------------------------- ADVICE r8: position_attribution boundary


def test_position_attribution_subsecond_lookback_boundary(spark):
    """A touch landing EXACTLY lookback_seconds before a sub-second
    conversion timestamp must be included identically on both engines
    — the r8 double-seconds comparison could flip it by one ulp; the
    fix compares exact integer microseconds."""
    from gis_city_county_spark.operators.temporal import (
        position_attribution,
        position_attribution_sql,
    )

    conv = spark.createDataFrame(
        [(100, 1, "2024-01-10 12:00:00.000123")],
        "event_id long, user_id long, ts_s string",
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    touch = spark.createDataFrame(
        [
            # exactly on the 3600s boundary (inclusive)
            (11, 1, "2024-01-10 11:00:00.000123", "edge"),
            # one microsecond before the boundary (excluded)
            (12, 1, "2024-01-10 11:00:00.000122", "out"),
        ],
        "event_id long, user_id long, ts_s string, channel string",
    ).select(
        "event_id", "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"), "channel",
    )

    got = sorted(
        tuple(r)
        for r in position_attribution(
            conv, touch, ["user_id"], "event_id", "ts", "ts",
            "channel", "event_id", lookback_seconds=3600.0,
        ).collect()
    )
    assert got == [("edge", 1, 1000)]

    con = duckdb.connect()
    con.register("conv", conv.toPandas())
    con.register("touch", touch.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            position_attribution_sql(
                "SELECT * FROM conv", "SELECT * FROM touch",
                ["user_id"], "event_id", "ts", "ts", "channel",
                "event_id", lookback_seconds=3600.0,
            )
        ).fetchall()
    )
    assert got == want
