"""Driver-window rotation planner.

The external driver hash-checks only ``all_specs()[:50]`` per round,
so cumulative coverage grows only if each round's window targets rows
no prior round has checked (plus re-proving any red rows).  This
module computes the NEXT round's proposed window from the committed
``CORRECTNESS_r*.json`` artifacts; the builder pastes the output into
``suite/__init__.py`` as the new pinned window and updates
``tests/test_contract_shapes.py``.

Usage::

    python -m gis_city_county_spark.suite.rotation
"""

from __future__ import annotations

import json
from pathlib import Path

from gis_city_county_spark.suite import DRIVER_WINDOW, all_specs

REPO = Path(__file__).resolve().parent.parent.parent


def correctness_rows(repo: Path = REPO) -> dict[str, dict]:
    """name → latest driver row across every CORRECTNESS_r*.json
    (later rounds win)."""
    rows: dict[str, dict] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        rows.update(json.loads(path.read_text()))
    return rows


def propose_window(repo: Path = REPO, size: int = DRIVER_WINDOW) -> list[str]:
    """Red rows first (fixes to prove), then never-checked specs in
    registration order; any remaining slots re-confirm the oldest
    green rows."""
    rows = correctness_rows(repo)
    order = [s.name for s in all_specs()]

    def is_green(r: dict) -> bool:
        return bool(
            r.get("rows_match") and r.get("schema_match")
            and (r.get("hash_match") is not False) and not r.get("err")
        )

    red = [n for n in order if n in rows and not is_green(rows[n])]
    unchecked = [n for n in order if n not in rows]
    green = [n for n in order if n in rows and is_green(rows[n])]
    window = (red + unchecked + green)[:size]
    return window


if __name__ == "__main__":
    win = propose_window()
    rows = correctness_rows()
    n_checked = len(rows)
    n_unchecked = len([s for s in all_specs() if s.name not in rows])
    print(f"# checked so far: {n_checked}; still unchecked: {n_unchecked}")
    print(f"# proposed next window ({len(win)}):")
    for name in win:
        tag = "red" if name in rows else "new"
        print(f'    "{name}",  # {tag}')
