"""Unit semantics for the CDC operators (operators.cdc) on tiny
literal frames — the suite oracle covers scale/hash parity; these pin
the row-level contracts (delete removes, insert appears, update
replaces, SCD2 collapses runs, diff statuses)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gis_city_county_spark.operators.cdc import (
    merge_upsert,
    scd2_history,
    snapshot_diff,
)


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, "c", "D"), (4, "d", "I")], ["id", "v", "op"]
    )
    out = {r["id"]: r["v"] for r in merge_upsert(base, changes, ["id"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_scd2_collapses_runs_and_marks_current(spark):
    rows = [
        (1, 10, "x", 100),
        (2, 10, "x", 200),  # same state → collapsed into first interval
        (3, 10, "y", 300),
        (4, 20, "z", 50),
    ]
    df = spark.createDataFrame(rows, ["event_id", "k", "state", "t"])
    hist = scd2_history(
        df, key_cols=["k"], ts_col="t", attr_cols=["state"], tiebreak="event_id"
    ).collect()
    by = {(r["k"], r["state"]): r for r in hist}
    assert len(hist) == 3
    assert by[(10, "x")]["valid_from"] == 100
    assert by[(10, "x")]["valid_to"] == 300
    assert not by[(10, "x")]["is_current"]
    assert by[(10, "y")]["is_current"] and by[(10, "y")]["valid_to"] is None
    assert by[(20, "z")]["is_current"]


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    new = spark.createDataFrame([(2, "b"), (3, "C"), (4, "d")], ["id", "v"])
    out = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, ["id"], ["v"]).collect()
    }
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_merge_upsert_plan_has_no_extra_shuffle_on_broadcastable_changes(spark):
    """With a small change set, the survivors side should be a
    broadcast anti-join — the base is scanned once, never exchanged."""
    base = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    changes = (
        spark.range(0, 10)
        .withColumn("v", F.lit(-1).cast("long"))
        .withColumn("op", F.lit("U"))
    )
    merged = merge_upsert(base, F.broadcast(changes), ["id"])
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_incremental_agg_refresh_retraction(spark):
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.cdc import (
        agg_snapshot,
        incremental_agg_refresh,
    )

    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double"
    )
    snap = agg_snapshot(base, ["k"], {"sum_v": "v"})
    # retract one 'a' row and ALL of 'b' (negative count/sums)
    retract = spark.createDataFrame(
        [("a", -1, -2.0), ("b", -1, -5.0)],
        "k string, n_rows long, sum_v double",
    ).withColumn("sum_v", F.col("sum_v").cast("decimal(38,10)"))
    out = incremental_agg_refresh(snap, retract, ["k"], ["sum_v"])
    rows = {(r.k, r.n_rows, float(r.sum_v)) for r in out.collect()}
    # 'b' reached count 0 -> dropped; 'a' keeps one row summing 1.0
    assert rows == {("a", 1, 1.0)}


def test_run_report_collects_all_gate_failures(spark):
    from gis_city_county_spark.operators.gates import (
        GateError,
        RunReport,
        expect_min_count,
    )

    df = spark.createDataFrame([(1,), (2,)], ["x"])
    rpt = RunReport()
    assert rpt.check("enough_rows", expect_min_count, df, 1, "t") is df
    assert rpt.check("too_few", expect_min_count, df, 500, "t") is None
    rpt.record("custom", True)
    assert not rpt.ok
    rows = {(r.gate, r.ok) for r in rpt.df(spark).collect()}
    assert rows == {("enough_rows", True), ("too_few", False), ("custom", True)}
    try:
        rpt.raise_if_failed()
        raise AssertionError("should have raised")
    except GateError as e:
        assert "too_few" in str(e)
