"""Re-record a historical round's plan fingerprints with the CURRENT
(fixed) normalizer.

The round-8 judge proved the pre-r9 normalizer leaked Spark's
session-global lambda counter for every lambda variable not literally
named ``x_N`` (``zip_with``'s ``y_N#``, ``aggregate``'s ``acc_N#``), so
every snapshot recorded before the fix is order-dependent noise for
lambda-heavy plans.  This script replays a historical tree's
``all_specs()`` through the FIXED ``normalize_plan`` and overwrites
that round's entry in the live repo's ``PLAN_HASHES.json``.

Usage (from anywhere)::

    python /root/repo/scripts/refingerprint.py <tree_root> <round_no>

``tree_root`` is a git worktree checked out at the round's final
commit (or the live repo itself for the current round).  The script
puts ``tree_root`` FIRST on ``sys.path`` so the historical package is
the one imported, then loads the LIVE repo's ``rotation.py`` by file
path so the fixed ``_VOLATILE`` rules do the normalizing.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

LIVE_REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    tree_root, round_no = Path(sys.argv[1]).resolve(), int(sys.argv[2])
    sys.path.insert(0, str(tree_root))

    spec = importlib.util.spec_from_file_location(
        "rotation_fixed",
        LIVE_REPO / "gis_city_county_spark" / "suite" / "rotation.py",
    )
    rot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rot)  # imports all_specs from tree_root

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName(f"refingerprint-r{round_no}").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hashes = rot.plan_fingerprints(spark)
    path = LIVE_REPO / "PLAN_HASHES.json"
    hist = json.loads(path.read_text()) if path.exists() else {}
    hist[str(round_no)] = hashes
    path.write_text(
        json.dumps({k: hist[k] for k in sorted(hist, key=int)}, indent=1)
    )
    print(f"re-recorded round {round_no}: {len(hashes)} fingerprints "
          f"from {tree_root}")


if __name__ == "__main__":
    main()
