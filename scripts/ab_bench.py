"""Interleaved checkout A/B for bench-outlier adjudication.

One invocation = one tree, one fresh JVM, the named queries timed
fastest-of-N at sf0.1 with bench.py's exact warmup sequence.  The
caller interleaves invocations across checkouts (A/B/A/B...) on a
quiet box so slow host drift hits both trees equally — the recipe
that closed the ref_j1 adjudication in round 8
(docs/BENCH_NOTES.md).

Usage::

    python scripts/ab_bench.py <tree_root> <q1,q2,...> [passes=5]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time


def main() -> None:
    tree = sys.argv[1]
    names = sys.argv[2].split(",")
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sys.path.insert(0, tree)

    from gis_city_county_spark.session import get_spark
    from gis_city_county_spark.suite import all_specs

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-bench")

    specs = {s.name: s for s in all_specs()}
    missing = [n for n in names if n not in specs]
    assert not missing, f"unknown queries: {missing}"

    # bench.py's warmup sequence: JVM + parquet footers, the Python
    # worker pool, then one untimed real query per target (codegen).
    spark.range(1).count()
    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for n in names:
        specs[n].fn(spark, sf_dir).count()

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            df = specs[n].fn(spark, sf_dir)
            df.count()
            dt = time.perf_counter() - t0
            # bench.py's exact hygiene: drop refs to the previous
            # pass's localCheckpoint RDDs AFTER the clock stops —
            # pinned blocks otherwise inflate later passes 2-3x and
            # (r12, measured) can even flip an A/B verdict.
            del df
            gc.collect()
            runs[n].append(round(dt, 4))
    print(json.dumps({
        "tree": tree,
        "fastest": {n: min(r) for n, r in runs.items()},
        "runs": runs,
    }))


if __name__ == "__main__":
    main()
