"""Driver-window rotation planner — evidence-driven re-proofs.

The external driver hash-checks only ``all_specs()[:50]`` per round,
so cumulative coverage grows only if each round's window targets rows
no prior round has checked, plus re-proving (a) red rows and (b) green
rows whose PHYSICAL PLAN changed since their last green check.  Until
round 5 the (b) set was a judgment call; this module mechanizes it
with **plan fingerprints**: a normalized hash of every query's
optimized plan, snapshotted per round into ``PLAN_HASHES.json``.  A
green query whose current fingerprint differs from the fingerprint
recorded at (or after) the round of its latest green row has, by
construction, a plan the driver never hashed — it proposes itself for
re-proof with a reason.

Usage::

    python -m gis_city_county_spark.suite.rotation            # propose
    python -m gis_city_county_spark.suite.rotation --snapshot # record

``--snapshot`` records the CURRENT round's fingerprints (run it at the
end of a round, after the last plan-affecting commit); the proposal
run compares the working tree's fingerprints against history.  The
builder pastes the proposal into ``suite/windows.py`` as the next
pinned window.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from gis_city_county_spark.suite import DRIVER_WINDOW, all_specs

REPO = Path(__file__).resolve().parent.parent.parent
PLAN_HASHES = REPO / "PLAN_HASHES.json"

_DEFAULT_SF = "/root/testdata/sf0.001"


def correctness_rows(repo: Path = REPO) -> dict[str, dict]:
    """name → latest driver row across every CORRECTNESS_r*.json
    (later rounds win)."""
    rows: dict[str, dict] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        rows.update(json.loads(path.read_text()))
    return rows


def _latest_green_round(repo: Path = REPO) -> dict[str, int]:
    """name → round of its most recent GREEN driver row."""
    out: dict[str, int] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.loads(path.read_text()).items():
            if _is_green(row):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _is_green(r: dict) -> bool:
    return bool(
        r.get("rows_match") and r.get("schema_match")
        and (r.get("hash_match") is not False) and not r.get("err")
    )


# Volatile plan-string tokens that differ run-to-run without the plan
# SHAPE changing: expression ids (#123), codegen/plan ids, JVM object
# hashes, temp/session paths, LogicalRDD numbering, statistics.
_VOLATILE = [
    (re.compile(r"#\d+"), "#"),
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"@[0-9a-f]{6,}"), "@"),
    (re.compile(r"(file:)?/[^\s,\)\]]*(tmp|warehouse|testdata)[^\s,\)\]]*"), "<path>"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics()"),
    (re.compile(r"\[id=#?\d*\]"), "[id]"),
    (re.compile(r"cachedrdd-\d+"), "cachedrdd"),
    # Spark's higher-order-function lambda variables are numbered by a
    # session-global counter — the SAME query gets different numbers
    # depending on how many lambda-using plans were built before it in
    # the session.  The counter attaches to EVERY lambda parameter name
    # (x_1, y_2, acc_3, ... for ``lambda x``, ``zip_with``'s second
    # variable, ``aggregate``'s accumulator), so the rule must cover
    # any lowercase prefix, not just ``x_`` (the r8 bug: ``y_N#`` leaked
    # the counter and 22/24 round-7→8 fingerprint diffs were phantom).
    (re.compile(r"\b([a-z]+)_\d+#"), r"\1_#"),
]


def normalize_plan(plan: str) -> str:
    for rx, rep in _VOLATILE:
        plan = rx.sub(rep, plan)
    return plan


def plan_fingerprints(
    spark, sf_dir: str = _DEFAULT_SF, names: set[str] | None = None
) -> dict[str, str]:
    """name → sha1 of the normalized ANALYZED plan at ``sf_dir``.

    The analyzed plan (pre-optimizer) is the deterministic image of
    the query the code declares — optimizer output is NOT stable
    run-to-run (e.g. the multi-distinct rewrite orders its Expand
    grouping via an ExpressionSet, which permutes with expression
    ids), so hashing it would flag phantom changes.  Any change to
    OUR code that alters the plan alters the declared tree too.

    Building the DataFrame executes any eager steps inside the query
    fn (fixpoint loops, localCheckpoints) at the tiny SF — the same
    cost the pytest oracle mirror already pays."""
    import hashlib

    out: dict[str, str] = {}
    for spec in all_specs():
        if names is not None and spec.name not in names:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().analyzed().toString()
        out[spec.name] = hashlib.sha1(
            normalize_plan(plan).encode()
        ).hexdigest()[:16]
    return out


def load_hash_history(path: Path = PLAN_HASHES) -> dict[int, dict[str, str]]:
    if not path.exists():
        return {}
    raw = json.loads(path.read_text())
    return {int(k): v for k, v in raw.items()}


def snapshot_hashes(
    spark, round_no: int, sf_dir: str = _DEFAULT_SF, path: Path = PLAN_HASHES
) -> dict[str, str]:
    """Record the current round's fingerprints (overwrites that
    round's entry, preserves others)."""
    hist = load_hash_history(path)
    hist[round_no] = plan_fingerprints(spark, sf_dir)
    path.write_text(
        json.dumps({str(k): hist[k] for k in sorted(hist)}, indent=1)
    )
    return hist[round_no]


def _hash_at_or_after(
    hist: dict[int, dict[str, str]], name: str, rnd: int
) -> str | None:
    """The fingerprint closest to (>=) the query's last green round —
    the plan the driver most plausibly hashed."""
    for r in sorted(hist):
        if r >= rnd and name in hist[r]:
            return hist[r][name]
    # fall back to the newest snapshot at or before the round
    for r in sorted(hist, reverse=True):
        if name in hist[r]:
            return hist[r][name]
    return None


def propose_window(
    repo: Path = REPO,
    size: int = DRIVER_WINDOW,
    current_hashes: dict[str, str] | None = None,
) -> list[tuple[str, str, str]]:
    """Propose the next window as (name, kind, reason) triples:

    * red rows first (fixes to prove),
    * then never-checked specs in registration order,
    * then greens whose plan fingerprint CHANGED since their last
      green check (evidence-driven re-proofs, needs
      ``current_hashes`` + a committed PLAN_HASHES.json),
    * then the stalest greens (oldest green round) as re-confirms.
    """
    rows = correctness_rows(repo)
    green_round = _latest_green_round(repo)
    order = [s.name for s in all_specs()]

    red = [(n, "red", "latest driver row not green")
           for n in order if n in rows and not _is_green(rows[n])]
    unchecked = [(n, "new", "no driver row yet")
                 for n in order if n not in rows]

    changed: list[tuple[str, str, str]] = []
    hist = load_hash_history(repo / "PLAN_HASHES.json")
    if current_hashes and hist:
        for n in order:
            if n not in green_round or any(n == t[0] for t in red):
                continue
            old = _hash_at_or_after(hist, n, green_round[n])
            new = current_hashes.get(n)
            if old is not None and new is not None and old != new:
                changed.append((
                    n, "reproof",
                    f"plan changed since green round r{green_round[n]} "
                    f"({old}->{new})",
                ))
    taken = {t[0] for t in red + unchecked + changed}
    stale = sorted(
        (n for n in order if n in green_round and n not in taken),
        key=lambda n: green_round[n],
    )
    reconfirm = [(n, "reconfirm", f"green since r{green_round[n]}, stalest")
                 for n in stale]
    return (red + unchecked + changed + reconfirm)[:size]


if __name__ == "__main__":
    import sys

    snapshot = "--snapshot" in sys.argv
    need_spark = snapshot or PLAN_HASHES.exists()
    cur = None
    if need_spark:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .appName("rotation-planner").getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        if snapshot:
            from gis_city_county_spark.suite import CURRENT_ROUND

            snapshot_hashes(spark, CURRENT_ROUND)
            print(f"# snapshotted round {CURRENT_ROUND} plan hashes "
                  f"-> {PLAN_HASHES}")
            sys.exit(0)
        cur = plan_fingerprints(spark)

    rows = correctness_rows()
    n_unchecked = len([s for s in all_specs() if s.name not in rows])
    print(f"# checked so far: {len(rows)}; still unchecked: {n_unchecked}")
    win = propose_window(current_hashes=cur)
    print(f"# proposed next window ({len(win)}):")
    for name, kind, reason in win:
        print(f'    "{name}",  # {kind}: {reason}')
