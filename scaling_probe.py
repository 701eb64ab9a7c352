"""Scaling probe: do the most expensive suite queries scale linearly?

Every "designed for 100 TB" claim in COVERAGE.md rests on plans whose
work grows ~linearly with input (bucketed joins, bounded shortlists,
map-combinable aggregates).  The cheapest honest test of that is to
run the top-N most expensive queries at sf0.1 AND at a synthetic
``factor``× replica and assert wall-clock grows at most
``SLACK × factor`` (a super-linear query has a hidden all-pairs or
global-sort term that 100 TB would expose).

The replica is built from sf0.1 itself — key columns are shifted by a
per-copy offset so entity cardinality scales with the data (duplicated
keys would warp join/group fan-in), document tokens get a per-copy
suffix so cross-copy texts are NOT near-duplicates (identical texts
would grow candidate pairs quadratically — a data artifact, not a plan
flaw), and timestamps are left alone (event density grows at fixed
horizon, like real traffic).  Nation/region are fixed dimensions at
every SF and are copied verbatim.

Usage::

    python scaling_probe.py [--factor 8] [--passes 2] [--top N]

Writes ``BENCH_SCALING.json`` next to this script;
``tests/test_scale.py::test_scaling_probe_artifact`` flags any
super-linear query whenever the artifact is present.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The queries whose absolute cost dominates the bench (BENCH_DETAIL
# top slice): iterative graph ops, the persisted-IVF probe, BPE merge
# induction, the dedup keeper/yield chain, semantic dedup, prefix
# Jaccard, and the PQ re-rank.  Keep in sync with VERDICT r4 item 3.
# Synced to the BENCH_DETAIL top slice each round (VERDICT r5 item 5):
# the 14 most expensive benched queries, plus the two standing watch
# items (persisted IVF; PQ re-rank, whose new max_probe_batch cap this
# probe must re-measure) and the round-6 bucketed bitext miner (its
# first scaling row).
PROBE_QUERIES = [
    "graph_label_propagation",
    "dedup_containment_pairs",
    "graph_pagerank_trade",
    "graph_bfs_hops",
    "pipeline_semantic_dedup",
    "corpus_pair_merges",
    "graph_kcore_trade",
    "dedup_ngram_jaccard",
    "sim_kmeans_refine",
    "dedup_cluster_keeper",
    "pipeline_dedup_yield",
    "eval_average_precision",
    "dedup_connected_components",
    "dedup_prefix_jaccard_join",
    "sim_ivf_index_persisted",
    "sim_pq_rerank_topk",
    "sim_bitext_mining_lsh",
    # round-8 additions in the >3.5s bench class: the full-corpus
    # blocking-truth audit, the components-size histogram (rides the
    # same chain as semantic dedup), and the BFS reach summary.
    "dedup_blocking_recall",
    "dedup_cluster_size_histogram",
    "graph_reach_summary",
    # round-9: the only r8 bench-headline key without a scaling row
    # (VERDICT r8 item 5) — an equi-join + per-conversion window.
    "events_position_attribution",
    # round-9 additions in the bench-headline class.
    "dedup_substring_spans",
    "graph_clustering_coefficient",
    "events_rfm_scores",
    # round-9 second wave bench-headline cost centers: the rank
    # correlation (two bucketed cumsums + two value joins) and the
    # co-occurrence projection (C(m,2) pair fan-out per group).
    "eval_spearman",
    "graph_cooccurrence_pairs",
    # round-10: the single most expensive benched query (7.19s r9
    # fastest pass) and the only bench-top-slice member without a
    # scaling row (VERDICT r9 item 4) — a scan-side ×32 replica
    # explode whose per-replica weighted sums are map-combinable.
    "eval_bootstrap_ci",
    # round-10 second sync: the two remaining >4s top-slice members
    # without probe rows — the GraphSAGE-style bounded 2-hop sample
    # (fan-out capped at k/k² by construction) and the MinHash
    # estimator calibration (one extra signature join over verified
    # pairs).
    "graph_ego_sample",
    "dedup_minhash_accuracy",
    # round-10 addition in the 3s class: winnowing fingerprint
    # selection + the cross-doc sharing audit over the winnowed
    # (~2/(w+1) density) relation.
    "dedup_winnowing",
    # round-11 addition in the bench class: sentence-hash dedup (the
    # sentence shuffle grows with the corpus).
    "text_sentence_dedup",
    # round-11 second wave >1.5s keys: the two-phase-ranked lift
    # table, the shingle-ownership novelty join, and the Heaps
    # first-occurrence census.  (sim_lsh_recall_audit is EXCLUDED by
    # design: its exact side is |corpus| x |probes| with probes a
    # fixed corpus fraction, so an sf-replica probe measures the
    # documented quadratic audit budget, not a hidden regression —
    # at scale the caller fixes |probes| by raising probe_mod; see
    # docs/SCALE.md.)
    "eval_lift_table",
    "text_ngram_novelty",
    "corpus_heaps_curve",
    # round-12 directed rows (VERDICT r11 item 3): the suite's only
    # iterative MM operator — the sf replica scales USERS (hence
    # contests, the big input) while the item census (event types) is
    # FIXED at every SF, exactly the "fixed item census" shape the
    # directive asks for — and the consolidated tokenizer-fertility
    # operator (trivially linear scan-side counters; its first row).
    "eval_bradley_terry",
    "text_tokenizer_fertility",
    # round-12 new-operator row: the one r12 addition with a
    # vocabulary-sized shuffle (the per-copy token suffix grows the
    # vocab with the replica, so the token-total equi-join is
    # genuinely stressed; the calendar-bounded pettitt/runs ops are
    # sub-linear by construction and skip the probe).
    "corpus_tv_distance",
    # late round-12 addition: the BH gate's ranged_rank is the
    # scale-relevant path (three bounded passes over the p-value
    # relation, replica scales the test battery); eval_did is one
    # scan-side aggregate and skips the probe.
    "eval_bh_fdr",
    # ICC: the replica scales CLUSTERS (orders) at fixed cluster
    # size — the "shuffle ∝ clusters" claim measured directly.
    "mlprep_icc_deff",
    # conformal: ranged_rank selection over the calibration split +
    # the test-side scan; replica scales both splits together.
    "eval_conformal",
    # QTE: two per-arm ranged_ranks; replica scales both arms.
    "eval_qte",
]

# Wall-clock at factor F may legitimately exceed F× (more shuffle
# waves per fixed core count, deeper reduce trees); 1.5× linear is the
# VERDICT-agreed budget separating "fine" from "hidden quadratic".
SLACK = 1.5


# ------------------------------------------------- synthetic probes
#
# The multimodal pair ops run on constant-size golden fixtures in the
# suite (bench=False), so sf-replica probes can't scale them.  These
# builders generate the DECODED relation directly at a requested row
# count — the probe times the banded join, never the codec (VERDICT
# r10 item 4).  Inputs are clustered like real corpora: dHash rows in
# near-dup groups of 4 (base hash per group, 1 flipped bit per
# member), audio fingerprints in clip pairs sharing all 16 window
# hashes at one consistent offset.


def _synth_dhash_pairs(spark, n_rows: int):
    from gis_city_county_spark.operators.multimodal import dhash_near_pairs

    hashes = spark.range(n_rows).selectExpr(
        "id AS img_id",
        "CAST(conv(substring(md5(concat('hi|',"
        " CAST(id div 4 AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        " AS dhash_hi",
        "CAST(conv(substring(md5(concat('lo|',"
        " CAST(id div 4 AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        " ^ shiftleft(CAST(1 AS BIGINT), CAST(id % 4 AS INT))"
        " AS dhash_lo",
    )
    return dhash_near_pairs(hashes, "img_id", max_hamming=6)


def _synth_audio_matches(spark, n_rows: int):
    from gis_city_county_spark.operators.multimodal import (
        audio_fingerprint_matches,
    )

    # n_rows fingerprint rows = n_rows/16 clips x 16 windows; clips
    # 2i and 2i+1 share every window hash (offset 0), others collide
    # only by chance in the 60-bit space.
    fps = spark.range(n_rows).selectExpr(
        "id div 16 AS clip_id",
        "CAST(id % 16 AS INT) AS win_idx",
        "CAST(conv(substring(md5(concat('fp|',"
        " CAST(id div 32 AS STRING), '|', CAST(id % 16 AS STRING))),"
        " 1, 15), 16, 10) AS BIGINT) AS fp_hash",
    )
    return audio_fingerprint_matches(fps, "clip_id")


SYNTH_PROBES = {
    # name -> (builder, base_rows)
    "mm_dhash_near_pairs": (_synth_dhash_pairs, 40_000),
    "mm_audio_fp_matches": (_synth_audio_matches, 160_000),
}

# Per-copy key offsets, comfortably above each table's max key at any
# test SF so shifted copies never collide.
_OFFSET = 100_000_000


def _scaled_copy(src: str, dst: str, factor: int) -> None:
    """Write a ``factor``× key-shifted replica of every table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    shifts = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "nation": [],
        "region": [],
    }
    os.makedirs(dst, exist_ok=True)
    for table, keys in shifts.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"))
        if not keys:  # fixed dimension: same at every SF
            pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
            continue
        copies = []
        for i in range(factor):
            c = t
            for k in keys:
                col = c.column(k)
                shifted = pc.add(col, pa.scalar(i * _OFFSET, type=col.type))
                c = c.set_column(c.schema.get_field_index(k), k, shifted)
            if table == "embeddings" and i > 0:
                # Cyclic roll per copy: identical vectors across copies
                # would be cosine-1.0 near-dups of each other, growing
                # semantic-dedup pair counts quadratically with factor.
                # A roll preserves norms and the value distribution but
                # decorrelates copies.
                import numpy as np

                mat = np.asarray(c.column("embedding").to_pylist(),
                                 dtype=np.float32)
                rolled = np.roll(mat, i, axis=1)
                c = c.set_column(
                    c.schema.get_field_index("embedding"),
                    "embedding",
                    pa.array(list(rolled), type=pa.list_(pa.float32())),
                )
            if table == "documents" and i > 0:
                # Per-copy token suffix: copies must not be
                # near-duplicates of each other or candidate pairs grow
                # quadratically with factor by construction.
                texts = c.column("text").to_pylist()
                tagged = [
                    " ".join(f"{w}x{i}" for w in (s or "").split())
                    for s in texts
                ]
                c = c.set_column(
                    c.schema.get_field_index("text"),
                    "text",
                    pa.array(tagged, type=pa.string()),
                )
            copies.append(c)
        pq.write_table(
            pa.concat_tables(copies), os.path.join(dst, f"{table}.parquet")
        )


def merge_results(
    results: dict, artifact: str, only: bool, factor: int, no_write: bool
) -> dict:
    """Merge a ``--only`` re-probe into the existing artifact rows.

    Same-factor: targeted rows replace their prior entries, everything
    else survives.  Different factor without ``--no-write``: REFUSE —
    writing would silently drop every prior row (the artifact has one
    factor), which is exactly the data loss the merge exists to avoid.
    """
    merged = dict(results)
    if only and os.path.exists(artifact):
        prior = json.load(open(artifact))
        if prior.get("factor") == factor:
            merged = {**prior.get("queries", {}), **results}
        elif not no_write:
            raise SystemExit(
                f"--only at factor {factor} does not match the existing "
                f"artifact's factor {prior.get('factor')}; pass "
                "--no-write for exploratory factors or re-probe the "
                "full list"
            )
    return merged


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--top", type=int, default=len(PROBE_QUERIES))
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: re-probe just these and "
        "MERGE their rows into the existing artifact (same factor)",
    )
    ap.add_argument(
        "--no-write",
        action="store_true",
        help="print results without touching BENCH_SCALING.json "
        "(exploratory runs at non-standard factors)",
    )
    args = ap.parse_args()

    from gis_city_county_spark.session import get_spark
    from gis_city_county_spark.suite import all_specs

    # Cache key includes the BASE dataset identity (path + mtime +
    # size of the largest table), not just the factor — otherwise a
    # changed SPARK_GRAFT_SF_DIR or regenerated testdata would reuse a
    # replica built from different data and every ratio would be
    # meaningless.
    import hashlib

    li = os.path.join(BASE_SF, "lineitem.parquet")
    try:
        st = os.stat(li)
        base_key = f"{BASE_SF}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        base_key = BASE_SF
    tag = hashlib.md5(base_key.encode()).hexdigest()[:10]
    scaled_dir = f"/tmp/sgraft_scale/{tag}_x{args.factor}"
    marker = os.path.join(scaled_dir, "_BUILT")
    if not os.path.exists(marker):
        shutil.rmtree(scaled_dir, ignore_errors=True)
        print(f"# building {args.factor}x replica at {scaled_dir}",
              file=sys.stderr)
        _scaled_copy(BASE_SF, scaled_dir, args.factor)
        open(marker, "w").close()

    spark = get_spark(app_name="gis-city-county-spark-scaling")
    spark.range(1).count()
    slots = spark.sparkContext.defaultParallelism
    spark.range(slots, numPartitions=slots).mapInPandas(
        lambda it: it, "id long"
    ).count()

    specs = {s.name: s for s in all_specs()}
    if args.only:
        names = [n for n in args.only.split(",") if n in specs]
    else:
        names = [n for n in PROBE_QUERIES[: args.top] if n in specs]

    def best(name: str, sf_dir: str) -> float:
        # Release the previous query's localCheckpoint RDD blocks
        # before timing: iterative queries checkpoint per round, and
        # the accumulated executor blocks from earlier probe queries
        # otherwise inflate later ones 2-3x (measured on
        # pipeline_semantic_dedup: 74s polluted vs 28s clean at 8x).
        import gc

        gc.collect()
        spark.catalog.clearCache()
        t_best = float("inf")
        for p in range(args.passes):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0  # before gc: GC time is
            gc.collect()                   # hygiene, not query work
            t_best = min(t_best, dt)
        return t_best

    results = {}
    for name in names:
        t1 = best(name, BASE_SF)
        tn = best(name, scaled_dir)
        ratio = tn / max(t1, 1e-9)
        lin = ratio / args.factor
        results[name] = {
            "base_sec": round(t1, 3),
            "scaled_sec": round(tn, 3),
            "ratio": round(ratio, 3),
            "x_linear": round(lin, 3),
            "super_linear": lin > SLACK,
        }
        print(
            f"# {name}: {t1:.2f}s -> {tn:.2f}s at {args.factor}x "
            f"= {lin:.2f}x linear{' **SUPER-LINEAR**' if lin > SLACK else ''}",
            file=sys.stderr,
        )

    # Synthetic decode-once probes (fixture-bound ops the sf replica
    # can't scale): time the operator over a generated relation at
    # base_rows and factor x base_rows.
    only_set = set(args.only.split(",")) if args.only else None
    for name, (builder, base_n) in SYNTH_PROBES.items():
        if only_set is not None and name not in only_set:
            continue

        def best_synth(n_rows: int) -> float:
            import gc

            gc.collect()
            spark.catalog.clearCache()
            t_best = float("inf")
            for _p in range(args.passes):
                t0 = time.perf_counter()
                builder(spark, n_rows).count()
                dt = time.perf_counter() - t0
                gc.collect()
                t_best = min(t_best, dt)
            return t_best

        t1 = best_synth(base_n)
        tn = best_synth(base_n * args.factor)
        ratio = tn / max(t1, 1e-9)
        lin = ratio / args.factor
        results[name] = {
            "base_sec": round(t1, 3),
            "scaled_sec": round(tn, 3),
            "ratio": round(ratio, 3),
            "x_linear": round(lin, 3),
            "super_linear": lin > SLACK,
            "synthetic_rows": base_n,
        }
        print(
            f"# {name} (synthetic, {base_n} rows): {t1:.2f}s -> "
            f"{tn:.2f}s at {args.factor}x = {lin:.2f}x linear"
            f"{' **SUPER-LINEAR**' if lin > SLACK else ''}",
            file=sys.stderr,
        )

    artifact = os.path.join(REPO, "BENCH_SCALING.json")
    merged = merge_results(
        results, artifact, only=bool(args.only), factor=args.factor,
        no_write=args.no_write,
    )
    out = {
        "factor": args.factor,
        "slack": SLACK,
        "base_sf_dir": BASE_SF,
        "queries": merged,
        "super_linear": sorted(
            n for n, r in merged.items() if r["super_linear"]
        ),
    }
    if not args.no_write:
        with open(artifact, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({
        "metric": "scaling_probe",
        "factor": args.factor,
        "n_queries": len(results),
        "super_linear": out["super_linear"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
