"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE compact JSON line (total + headline queries only — r1's
full 200-query map overflowed the driver's line capture and came back
``"parsed": null``):
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

The full per-query timing map is written to ``BENCH_DETAIL.json``
next to this script.

Each query is timed end-to-end (plan + execute + materialize counts)
on a fresh action; the session is warmed once so JVM/codegen startup
isn't attributed to the first query.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gis_city_county_spark.session import get_spark
from gis_city_county_spark.suite import all_specs

# Headline set: the scan/join/agg-heavy queries that dominate runtime
# and represent each operator family. Keep in sync with SURVEY.md §7.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_revenue_forecast",
    "window_topk_per_group",
    "ref_j1_join_field_first_match",
    "ref_pipeline_flagship",
    "dedup_minhash_lsh_pairs",
    "sim_lsh_ann_topk",
    "text_token_stats",
    "geo_grid_refine_density",
    # r3: one representative per previously headline-less family, so
    # cross-round bench deltas are visible for the rotated driver
    # window's surfaces too.
    "mm_binary_features",
    "corpus_bpe_encode",
    "sketch_countmin_heavy_hitters",
    "graph_pagerank_trade",
    "cdc_merge_upsert",
    "events_sessionize",
    # r4: representatives for the families added this round
    "dedup_cluster_keeper",
    "mlprep_target_encode",
    "privacy_randomized_response",
    "graph_kcore_trade",
    "sim_pq_rerank_topk",
    # r7: the #2 cost center (BENCH_DETAIL r6: 5.58s) gets a graded
    # cross-round comparison; fastest-of-3 like every headline key.
    "dedup_containment_pairs",
    # r8: the two new >4s cost centers — the full-corpus blocking
    # truth audit and the BFS-riding reach summary — plus one cheap
    # representative for the new attribution/drift surfaces.
    "dedup_blocking_recall",
    "graph_reach_summary",
    "events_position_attribution",
    # r9: the three new >2.5s cost centers — positioned-window
    # substring spans, the co-supply triangle census, and the
    # three-pass ranged-rank RFM tiles.
    "dedup_substring_spans",
    "graph_clustering_coefficient",
    "events_rfm_scores",
    # r9 second wave: the two new >4s cost centers (the dual
    # ranged-cumsum rank correlation and the co-occurrence projection)
    # plus ams_f2 as the cheap sketch-family representative for
    # cross-round visibility (0.4s class — coverage, not cost).
    "eval_spearman",
    "graph_cooccurrence_pairs",
    "sketch_ams_f2",
    # r10: the three remaining >4s cost centers without a graded
    # cross-round comparison — the Poisson-bootstrap CI (suite's #2),
    # the bounded 2-hop ego sample, and the MinHash calibration.
    "eval_bootstrap_ci",
    "graph_ego_sample",
    "dedup_minhash_accuracy",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="gis-city-county-spark-bench")

    # Constant-size golden-fixture checks (bench=False) are excluded:
    # they don't read sf_dir, so their runtime is plan latency, not
    # throughput at the benchmark scale.
    specs = {s.name: s for s in all_specs() if s.bench}
    names = [n for n in HEADLINE if n in specs] + [
        n for n in specs if n not in HEADLINE
    ]

    # Warm up the JVM + parquet footer caches with a trivial action,
    # and the Python worker pool (fork + pandas/pyarrow import per
    # worker) with a no-op mapInPandas across all slots — startup
    # costs shouldn't be attributed to whichever query hits them
    # first.
    spark.range(1).count()
    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # One UNTIMED real query before the first timed pass: the trivial
    # warmups above don't exercise whole-stage codegen over a parquet
    # scan + hash aggregate, so whichever query ran first (tpch_q1)
    # carried a one-off 6x JIT spread that polluted the headline
    # comparison (VERDICT r5 nit 3c).  q1's shape (scan lineitem →
    # filter → agg) is exactly the path that needs compiling.
    first = names[0]
    specs[first].fn(spark, sf_dir).count()
    print(f"# warmup {first}: untimed", file=sys.stderr)

    # Fastest-of-N per query: JIT/codegen warm-up and host noise on
    # this box swing single runs by 2-5x, and the steady-state number
    # is what a long-running cluster job sees.
    # Adaptive passes: the bench must stay inside the driver's budget
    # as the suite grows (the 277-query suite blew a 10-minute ceiling
    # with unconditional passes).  Non-headline queries re-run only
    # when the first pass cost >= 0.6s (a sub-0.6s re-run contributes
    # noise, not signal); headline keys always get two passes, and the
    # third — whose only job is spread adjudication — runs only when
    # the first two already DISAGREE by >= 15% (agreeing passes have
    # nothing left to adjudicate).
    # Wall-clock budget guard: pass 0 ALWAYS completes (every query
    # needs a timing), but re-run passes shed as the budget runs out —
    # headline keys re-run first, then the rest — so the bench always
    # emits its JSON line inside the driver's capture window even on a
    # slow box (the 321-query suite's full 2-pass sweep exceeded 15
    # minutes under host noise; a single pass is ~7).  Shed re-runs
    # surface as spread=None in BENCH_DETAIL, never as missing keys.
    # Minimum-second-pass rule (round-10 verdict: 283/318 keys shipped
    # fastest-of-1 during a noisy-host episode): a key whose pass-0
    # reads >= 1.5x its COMMITTED prior value is exactly the key where
    # single-pass data misleads — it gets a mandatory second pass that
    # BYPASSES the budget shed (bounded extra cost: only inflated keys
    # qualify, and sub-0.3s keys stay exempt because their inflation
    # is scheduling jitter, not signal).  The prior is the COMMITTED
    # BENCH_DETAIL.json (``git show HEAD:``), NOT the on-disk file:
    # this script overwrites the file at the end of every run, so a
    # noisy local run would otherwise become the prior and silently
    # disarm the 1.5x trigger exactly when host noise was the problem
    # (round-11 advisory).  On-disk fallback covers non-git checkouts.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    prior: dict[str, float] = {}
    raw_prior = None
    try:
        import subprocess

        proc = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True, text=True, timeout=30,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            raw_prior = proc.stdout
    except Exception:
        raw_prior = None
    if raw_prior is None:
        try:
            with open(detail_path) as f:
                raw_prior = f.read()
        except Exception:
            raw_prior = None
    if raw_prior:
        try:
            prior = {
                k: float(v)
                for k, v in json.loads(raw_prior).get("queries", {}).items()
            }
        except Exception:
            prior = {}

    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))
    # One-off prior-refresh mode (round-11 verdict item 4): with
    # SPARK_GRAFT_BENCH_MIN_PASSES=2 the sub-0.6s adaptive skip is
    # disabled so EVERY key records a fastest-of-2, giving the
    # ≥1.5×-prior trigger a measured anchor suite-wide.  The driver
    # never sets this; default behavior is unchanged.
    min_passes = int(os.environ.get("SPARK_GRAFT_BENCH_MIN_PASSES", "1"))
    t_bench0 = time.perf_counter()
    shed = 0
    forced = 0
    runs: dict[str, list[float]] = {n: [] for n in names}
    headline = set(HEADLINE)

    def _must_rerun(name: str, r: list[float]) -> bool:
        p = prior.get(name)
        return bool(r) and p is not None and p > 0 \
            and r[0] >= 1.5 * p and r[0] >= 0.3
    for _pass in range(3):
        # headline keys take their re-run slots before the budget can
        # run out on them
        ordered = (
            names if _pass == 0
            else [n for n in names if n in headline]
            + [n for n in names if n not in headline]
        )
        for name in ordered:
            r = runs[name]
            if name not in headline:
                if _pass == 2:
                    continue
                if _pass == 1 and r and r[0] < 0.6 \
                        and min_passes < 2 and not _must_rerun(name, r):
                    continue
            elif _pass == 2:
                if (max(r) - min(r)) / max(min(r), 1e-9) < 0.15:
                    continue
            # HEADLINE re-runs are never shed: the graded cross-round
            # comparison needs fastest-of-2 on those ~35 keys (a
            # bounded ~60s overrun), while the long tail of
            # non-headline re-runs is what actually blows the window.
            # Keys reading >= 1.5x their committed prior are likewise
            # exempt from shedding — fastest-of-1 is exactly the wrong
            # artifact to ship for an inflated key.
            if (
                _pass > 0
                and name not in headline
                and time.perf_counter() - t_bench0 > budget_s
            ):
                if _pass == 1 and _must_rerun(name, r):
                    forced += 1
                else:
                    shed += 1
                    continue
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            # Drop Python refs to the previous query's localCheckpoint
            # RDDs NOW (after the clock stops — GC is hygiene, not
            # query work): iterative queries checkpoint per round, and
            # executor blocks pinned by earlier queries' lineage
            # otherwise inflate later passes 2-3x (the scaling probe
            # measured 74s polluted vs 28s clean; VERDICT r9 flagged
            # the same shape on pipeline_hard_negatives spreads).
            del df
            gc.collect()
            runs[name].append(dt)
            print(f"# pass{_pass} {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    timings = {n: round(min(r), 4) for n, r in runs.items()}
    # Relative spread (max-min)/min across a query's passes: ~0 means
    # the fastest pass is reproducible; large values flag noise.
    # Single-pass queries (the adaptive skip) publish None — a 0.0
    # there would masquerade as a VERIFIED-reproducible result.
    spread = {
        n: (round((max(r) - min(r)) / max(min(r), 1e-9), 3)
            if len(r) > 1 else None)
        for n, r in runs.items()
    }
    total = sum(timings.values())
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Headline spread guard: with the untimed codegen warmup in place,
    # a headline key whose passes still spread >= 2x signals host
    # noise (or a real nondeterministic plan) — name it loudly so a
    # cross-round delta on that key is adjudicated as noise instead of
    # being read as a regression.  Soft report, not a hard assert: the
    # bench must still produce its JSON line on a noisy box.
    # Extended to NON-headline keys whose fastest pass costs >= 1s:
    # VERDICT r9's watch item was exactly such keys
    # (pipeline_hard_negatives / text_rarity_score) spreading >= 2x
    # with no alert because they weren't headline.  Sub-1s keys stay
    # exempt — their spreads are dominated by scheduling jitter.
    spread_alert = sorted(
        n for n, s in spread.items()
        if s is not None and s >= 2.0
        and (n in HEADLINE or timings[n] >= 1.0)
    )
    if spread_alert:
        print(f"# SPREAD ALERT (>=2x across passes): {spread_alert}",
              file=sys.stderr)
    if shed:
        print(f"# budget guard: {shed} re-run passes shed after "
              f"{budget_s:.0f}s (fastest-of-1 for those keys)",
              file=sys.stderr)
    if forced:
        print(f"# budget guard: {forced} over-budget re-runs FORCED "
              f"(pass-0 >= 1.5x committed prior)", file=sys.stderr)

    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "suite_total_runtime",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs": {n: [round(x, 4) for x in r] for n, r in runs.items()},
                "sf": sf_val,
            },
            f,
            indent=1,
        )

    # Keep the stdout line small: total + headline TIMINGS only.  The
    # driver captures only the LAST 2000 chars of stdout (measured:
    # BENCH_r09's ``tail`` is exactly 2000 chars and starts mid-dict,
    # so the r9 line — timings + a per-key spread map — outran the
    # window and the graded artifact came back ``parsed: null``).  The
    # spread map and the full 300-query map live in BENCH_DETAIL.json;
    # ``tests/test_bench_contract.py`` pins the worst-case line length
    # under the window so headline growth can't silently break this
    # again.
    # The spread-alert list is BOUNDED in the primary line (head + a
    # count): an unbounded name list is exactly what pushed the r13
    # working run past the 1800-char cap and degraded the line to the
    # no-headline fallback — losing the per-query map the graded
    # comparison needs. Full list stays in BENCH_DETAIL.json; timing
    # methodology unchanged.
    line = json.dumps(
        {
            "metric": "suite_total_runtime",
            "value": round(total, 4),
            "unit": "sec",
            "queries": {
                n: round(timings[n], 3) for n in HEADLINE if n in timings
            },
            "n_spread_alerts": len(spread_alert),
            "spread_alert_head": spread_alert[:8],
            "shed_reruns": shed,
            "n_queries": len(timings),
            "detail": "BENCH_DETAIL.json",
            "sf": sf_val,
        }
    )
    if len(line) > 1800:  # last-resort: never exceed the capture window
        # The degraded line must stay BOUNDED and keep the budget-guard
        # signal: shed_reruns survives, and the (unbounded) spread
        # alert name list collapses to a count plus a fixed-size head —
        # a long alert list is exactly the case that triggers this
        # fallback, so echoing it verbatim could blow the window again.
        print(f"# stdout line {len(line)} chars > 1800: dropping the "
              f"headline map (see BENCH_DETAIL.json)", file=sys.stderr)
        line = json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": round(total, 4),
                "unit": "sec",
                "queries": {},
                "n_spread_alerts": len(spread_alert),
                "spread_alert_head": spread_alert[:8],
                "shed_reruns": shed,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
                "sf": sf_val,
            }
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
