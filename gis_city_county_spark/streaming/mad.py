"""Streaming twin of the daily MAD anomaly report.

``operators.temporal.daily_mad_anomalies`` derives the zero-filled
calendar, lower-median, MAD and flags from one batch pass.  The
streaming form rides the SHARED day-count fold
(``streaming.daycount`` — per-(batch, day) count partials,
associative, so folded sums bit-equal the batch per-day counts) and
publishes through the shared tail
(:func:`~gis_city_county_spark.operators.temporal.mad_from_day_counts`),
so the live report is bit-equal to the batch operator over all rows
arrived so far (asserted batch-by-batch in
``tests/test_streaming.py``).  Late events simply add to their day's
partial; the median/MAD — holistic over the CALENDAR grid, never the
events — re-derive on the next publish, exactly as a batch rerun
would.

Retry-idempotency and the empty-batch republish contract come from
the shared fold; see ``streaming/daycount.py``.
"""

from __future__ import annotations

from gis_city_county_spark.streaming.daycount import (
    daycount_batch_folder,
    streaming_daycount_report,
)


def _tail(k_milli: int):
    from gis_city_county_spark.operators.temporal import mad_from_day_counts

    def tail(counts):
        return mad_from_day_counts(counts, k_milli)

    return tail


def mad_batch_folder(
    state_dir: str,
    report_dir: str,
    ts_col: str,
    k_milli: int = 3500,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    return daycount_batch_folder(
        state_dir, report_dir, ts_col, _tail(k_milli)
    )


def streaming_mad_anomalies(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    ts_col: str,
    k_milli: int = 3500,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's per-day
    count partials into state and publish the refreshed MAD anomaly
    report into the batch's ``batch_id`` partition of ``report_dir``.
    Returns a ``DataStreamWriter`` — caller ``.start()``s it."""
    return streaming_daycount_report(
        spark, schema, incoming_path, state_dir, report_dir, ts_col,
        _tail(k_milli), max_files_per_trigger,
    )
