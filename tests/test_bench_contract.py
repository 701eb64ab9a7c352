"""bench.py stdout-line contract.

The external driver captures only the LAST 2000 characters of
bench.py's stdout (measured: BENCH_r09's ``tail`` field is exactly
2000 chars and starts mid-dict — the r9 line carried a per-key spread
map, outran the window, and the graded artifact came back
``parsed: null``).  These tests pin the WORST-CASE length of the one
JSON line bench.py prints, so growing the headline list can never
silently push the line past the capture window again.
"""

from __future__ import annotations

import json

import bench
import pytest

pytestmark = pytest.mark.fast


def _worst_case_line(n_alerts: int = 0) -> str:
    """The stdout line with every numeric field at its widest
    plausible rendering (4-digit seconds, 3 decimals)."""
    queries = {n: 9999.999 for n in bench.HEADLINE}
    return json.dumps(
        {
            "metric": "suite_total_runtime",
            "value": 99999.9999,
            "unit": "sec",
            "queries": queries,
            "n_spread_alerts": 9999,
            "spread_alert_head": sorted(bench.HEADLINE)[:n_alerts],
            "shed_reruns": 9999,
            "n_queries": 9999,
            "detail": "BENCH_DETAIL.json",
            "sf": 0.1,
        }
    )


def test_headline_line_fits_capture_window():
    line = _worst_case_line(n_alerts=0)
    assert len(line) <= 1800, (
        f"worst-case bench stdout line is {len(line)} chars — the "
        f"driver captures only the last 2000; trim the HEADLINE list "
        f"or shorten the stdout payload (full map belongs in "
        f"BENCH_DETAIL.json)"
    )


def test_line_with_max_alert_head_still_fits():
    # The primary line carries at most 8 alert names (the r13 cap: an
    # unbounded list degraded a 21-alert run to the no-headline
    # fallback); worst case must fit the window WITH the full
    # headline map.
    line = _worst_case_line(n_alerts=8)
    assert len(line) <= 1800


def test_fallback_line_bounded_and_keeps_budget_signal():
    # The > 1800-char fallback must (a) keep shed_reruns — the budget
    # guard's signal is most valuable exactly in the degraded case —
    # and (b) stay bounded even when EVERY benched query raises a
    # spread alert, by collapsing the name list to a count + a
    # fixed-size head (round-10 advisory).
    longest = max(bench.HEADLINE, key=len)
    alerts = [f"{longest}_{i:03d}" for i in range(400)]
    line = json.dumps(
        {
            "metric": "suite_total_runtime",
            "value": 99999.9999,
            "unit": "sec",
            "queries": {},
            "n_spread_alerts": len(alerts),
            "spread_alert_head": alerts[:8],
            "shed_reruns": 9999,
            "n_queries": 9999,
            "detail": "BENCH_DETAIL.json",
            "sf": 0.1,
        }
    )
    assert len(line) <= 1800
    assert '"shed_reruns"' in line
    src = open(bench.__file__).read()
    assert '"spread_alert_head": spread_alert[:8]' in src
    assert src.count('"shed_reruns": shed') == 2  # primary AND fallback


def test_headline_names_resolve():
    from gis_city_county_spark.suite import all_specs

    names = {s.name for s in all_specs() if s.bench}
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, f"HEADLINE names not in suite: {missing}"
