"""Streaming twin of the CUSUM changepoint screen.

``operators.temporal.cusum_changepoint`` derives the zero-filled
calendar, the exact-integer scaled cumulative deviations and the
argmax-|cusum| flag from one batch pass.  The streaming form rides
the SHARED day-count fold (``streaming.daycount`` — the same state
the MAD twin keeps: per-(batch, day) count partials, associative, so
folded sums bit-equal the batch per-day counts) and publishes
through the shared tail
(:func:`~gis_city_county_spark.operators.temporal.cusum_from_day_counts`),
so the live report is bit-equal to the batch operator over all rows
arrived so far (asserted batch-by-batch in
``tests/test_streaming.py``).  Late events add to their day's
partial; the grand totals, prefix sums and the changepoint argmax —
all holistic over the CALENDAR grid, never the events — re-derive on
the next publish, exactly as a batch rerun would.

Retry-idempotency and the empty-batch republish contract come from
the shared fold; see ``streaming/daycount.py``.
"""

from __future__ import annotations

from gis_city_county_spark.streaming.daycount import (
    daycount_batch_folder,
    streaming_daycount_report,
)


def _tail():
    from gis_city_county_spark.operators.temporal import (
        cusum_from_day_counts,
    )

    return cusum_from_day_counts


def cusum_batch_folder(state_dir: str, report_dir: str, ts_col: str):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and equivalence paths are directly testable."""
    return daycount_batch_folder(state_dir, report_dir, ts_col, _tail())


def streaming_cusum_changepoint(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    report_dir: str,
    ts_col: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's per-day
    count partials into state and publish the refreshed CUSUM report
    into the batch's ``batch_id`` partition of ``report_dir``.
    Returns a ``DataStreamWriter`` — caller ``.start()``s it."""
    return streaming_daycount_report(
        spark, schema, incoming_path, state_dir, report_dir, ts_col,
        _tail(), max_files_per_trigger,
    )
