"""Driver-sim parity sweep: run named queries (or ALL registered
specs) against their DuckDB oracles at the given SF dir and report
mismatches — the local stand-in for the driver's correctness gate.

Usage::

    python scripts/parity_sweep.py <sf_dir> [q1,q2,...|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    sel = sys.argv[2] if len(sys.argv) > 2 else "all"

    from gis_city_county_spark.session import get_spark
    from gis_city_county_spark.suite import all_specs
    from tests.oracle import compare, duckdb_connection

    specs = {s.name: s for s in all_specs()}
    names = list(specs) if sel == "all" else sel.split(",")
    missing = [n for n in names if n not in specs]
    assert not missing, f"unknown queries: {missing}"

    spark = get_spark(app_name="parity-sweep")
    con = duckdb_connection(sf_dir)
    bad = []
    t0 = time.time()
    for i, n in enumerate(names):
        s = specs[n]
        if s.oracle is None:
            continue
        try:
            r = compare(s.fn(spark, sf_dir), con, s.oracle)
            ok, detail = r.ok, r.detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXC {e}"
        if not ok:
            bad.append(n)
            print(f"MISMATCH {n}: {str(detail)[:300]}", flush=True)
        if (i + 1) % 25 == 0:
            print(f"# {i + 1}/{len(names)} ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
    print(f"MISMATCHES: {', '.join(bad) if bad else 'none'} "
          f"({len(names)} checked, {time.time() - t0:.0f}s)")
    con.close()
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
