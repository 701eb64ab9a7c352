"""Pin the driver-facing contract shapes.

The external driver verifies only the first ~50 entries of
``all_specs()`` against the DuckDB oracle each round, so the
registration order in ``suite/__init__.py`` is a contract: the
SURVEY.md §2 parity surface, the geometry family, and the LLM-pipeline
core (dedup / similarity / text) must land inside that window. This
test fails loudly if a future edit silently pushes them out.
"""

from __future__ import annotations

from gis_city_county_spark.suite import all_specs

WINDOW = 50

# Queries that MUST be driver-verified every round.
PRIORITY_PREFIXES = ("ref_", "geo_", "dedup_", "sim_")
PRIORITY_NAMES = {
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
}


def test_priority_queries_inside_driver_window() -> None:
    specs = all_specs()
    window = {s.name for s in specs[:WINDOW]}
    missing = [
        s.name
        for s in specs
        if (s.name.startswith(PRIORITY_PREFIXES) or s.name in PRIORITY_NAMES)
        and s.name not in window
    ]
    assert not missing, (
        f"priority queries outside the driver's first-{WINDOW} "
        f"correctness window: {missing}"
    )


def test_window_queries_all_have_oracles() -> None:
    # The window is wasted on any entry the driver can only rows-check.
    specs = all_specs()
    weak = [s.name for s in specs[:WINDOW] if s.oracle is None]
    assert not weak, f"first-{WINDOW} specs without DuckDB oracles: {weak}"


def test_no_duplicate_names() -> None:
    names = [s.name for s in all_specs()]
    assert len(names) == len(set(names))
