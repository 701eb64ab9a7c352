"""Split a query's wall time into driver-build (fn() — includes eager
checkpoint/collect jobs inside iterative operators) vs action
(count(), the bench's timed action) — tells you whether to attack the
per-round job overhead or the final plan.  Also reports the number of
Spark jobs each phase launched (statusTracker).

Usage::

    python scripts/profile_split.py <q1,q2,...> [passes=2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_city_county_spark.session import get_spark  # noqa: E402
from gis_city_county_spark.suite import all_specs  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-split")
    sc = spark.sparkContext
    specs = {s.name: s for s in all_specs()}

    spark.range(1).count()
    slots = sc.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        lambda it: it, "id long"
    ).count()

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    for n in names:
        specs[n].fn(spark, sf_dir).count()  # untimed codegen warm pass
        best = None
        for p in range(passes):
            j0 = n_jobs()
            t0 = time.perf_counter()
            df = specs[n].fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = n_jobs()
            df.count()
            t2 = time.perf_counter()
            j2 = n_jobs()
            rec = {
                "q": n, "pass": p,
                "build_s": round(t1 - t0, 3), "build_jobs": j1 - j0,
                "action_s": round(t2 - t1, 3), "action_jobs": j2 - j1,
                "total_s": round(t2 - t0, 3),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
            print(json.dumps(rec), flush=True)
        print(json.dumps({"best": best}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
