"""Pin the driver-facing contract shapes.

The external driver verifies only the first ~50 entries of
``all_specs()`` against the DuckDB oracle each round, so registration
order is a contract — and the window must ROTATE between rounds so
cumulative driver coverage grows (VERDICT r2: re-checking the same 50
adds zero new hard signal).  ``suite/__init__.py`` pins the current
round's window explicitly; this test fails loudly if an edit silently
reorders it, drops an oracle from it, or registers a window query
whose output shape the driver's canonicalizer cannot handle.
"""

from __future__ import annotations

import json
from pathlib import Path

from gis_city_county_spark.suite import _R3_WINDOW, DRIVER_WINDOW, all_specs

REPO = Path(__file__).resolve().parent.parent


def _driver_checked_names() -> set[str]:
    names: set[str] = set()
    for path in REPO.glob("CORRECTNESS_r*.json"):
        names.update(json.loads(path.read_text()).keys())
    return names


def test_window_is_the_pinned_rotation() -> None:
    specs = all_specs()
    assert [s.name for s in specs[: len(_R3_WINDOW)]] == list(_R3_WINDOW)
    assert len(_R3_WINDOW) == DRIVER_WINDOW == 50


def test_window_rotates_toward_unchecked_queries() -> None:
    # The round-3 window = the 4 rows red in r2 (fixes to prove) + 46
    # queries with no driver row in any prior round.
    checked = _driver_checked_names()
    rechecks = [n for n in _R3_WINDOW if n in checked]
    assert set(rechecks) == {
        "ref_f10_nullif_empty",
        "ref_a3_missing_gate",
        "func_vector_ops",
        "sim_kmeans_refine",
    }, f"window wastes rows re-checking already-green queries: {rechecks}"


def test_window_queries_all_have_oracles() -> None:
    # The window is wasted on any entry the driver can only rows-check.
    specs = all_specs()
    weak = [s.name for s in specs[:DRIVER_WINDOW] if s.oracle is None]
    assert not weak, f"first-{DRIVER_WINDOW} specs without DuckDB oracles: {weak}"


def test_no_duplicate_names() -> None:
    names = [s.name for s in all_specs()]
    assert len(names) == len(set(names))


def test_oracle_outputs_are_flat(spark, sf_dir) -> None:
    # The driver canonicalizer (pandas sort_values over all columns)
    # crashes on list cells — sim_kmeans_refine ERR'd in r2 this way.
    # Every oracle-paired query must return scalar-only columns.
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders: list[str] = []
    for spec in all_specs():
        if spec.oracle is None:
            continue
        schema = spec.fn(spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{spec.name}:{bad}")
    assert not offenders, (
        "oracle-checked queries with nested output columns (driver "
        f"canonicalizer cannot sort these): {offenders}"
    )


def test_rotation_planner_orders_red_then_unchecked(tmp_path) -> None:
    import json as _json

    from gis_city_county_spark.suite.rotation import propose_window

    specs = [s.name for s in all_specs()]
    red1, red2 = specs[10], specs[60]
    green = specs[5]
    (tmp_path / "CORRECTNESS_r01.json").write_text(_json.dumps({
        red1: {"rows_match": True, "schema_match": True, "hash_match": False},
        red2: {"rows_match": True, "schema_match": True, "hash_match": True,
               "err": "driver crash"},
        green: {"rows_match": True, "schema_match": True, "hash_match": True},
    }))
    win = propose_window(tmp_path, size=10)
    assert win[:2] == [n for n in specs if n in (red1, red2)][:2]
    assert green not in win  # greens only re-confirm after unchecked run out
    assert len(win) == 10
    # everything else in the window is driver-unchecked, in order
    unchecked = [n for n in specs if n not in (red1, red2, green)]
    assert win[2:] == unchecked[:8]
