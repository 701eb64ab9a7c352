"""Round-12 optimization profiler.

For each named query: capture ``explain("formatted")`` to
``plans/r12/<name>_<tag>.txt`` and time the computation with the noop
sink (guide §1.4 — materializes every column, no sink cost, full plan
in the SQL tab) fastest-of-N with labelled jobs (guide §1.5).

Usage::

    python scripts/profile_r12.py <tag> <q1,q2,...|top:N> [passes=3] [--no-time]

``tag`` is ``before`` / ``after`` (the committed plan artifact suffix).
``top:N`` selects the N most expensive queries from the committed
BENCH_DETAIL.json.  Timing output is one JSON line per query plus a
summary map written to ``/tmp/profile_r12_<tag>.json``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gis_city_county_spark.session import get_spark  # noqa: E402
from gis_city_county_spark.suite import all_specs  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r12")


def plan_shape(plan: str) -> dict:
    """Operator census of a formatted plan: the guide §1's checklist."""
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "scans": len(re.findall(r"Scan parquet|FileScan parquet", plan)),
    }


def main() -> None:
    tag = sys.argv[1]
    sel = sys.argv[2]
    passes = 3
    do_time = True
    for a in sys.argv[3:]:
        if a == "--no-time":
            do_time = False
        else:
            passes = int(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = {s.name: s for s in all_specs()}

    if sel.startswith("top:"):
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            prior = json.load(f)["queries"]
        names = [
            n for n, _ in sorted(prior.items(), key=lambda kv: -kv[1])
            if n in specs and specs[n].bench
        ][: int(sel.split(":")[1])]
    else:
        names = sel.split(",")
    missing = [n for n in names if n not in specs]
    assert not missing, f"unknown queries: {missing}"

    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark(app_name=f"profile-r12-{tag}")
    sc = spark.sparkContext

    # bench.py's warmup sequence.
    spark.range(1).count()
    slots = sc.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        lambda it: it, "id long"
    ).count()

    results: dict[str, dict] = {}
    for n in names:
        df = specs[n].fn(spark, sf_dir)
        jvm = spark._jvm
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS, f"{n}_{tag}.txt"), "w") as f:
            f.write(plan)
        shape = plan_shape(plan)
        entry: dict = {"shape": shape}
        if do_time:
            # untimed warm pass (codegen) then fastest-of-N noop sinks
            sc.setJobDescription(f"{n}: warm")
            df.write.format("noop").mode("overwrite").save()
            runs = []
            for p in range(passes):
                df = specs[n].fn(spark, sf_dir)
                sc.setJobDescription(f"{n}: pass{p}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 4))
            sc.setJobDescription(None)
            entry["noop_runs"] = runs
            entry["noop_best"] = min(runs)
        results[n] = entry
        print(json.dumps({"q": n, **entry}), flush=True)

    out = f"/tmp/profile_r12_{tag}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out} and plans/r12/*_{tag}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
