"""Geometry-kernel throughput micro-bench.

The planar kernel (``geo/kernel.py``) is pure Python inside Arrow-
batched pandas UDFs: perfectly distributable (each feature pair is
independent) but the per-CORE throughput ceiling for geometry at real
scale.  This script MEASURES that ceiling — polygons/sec/core for
``make_valid``, ``union``, and the planar ``_overlay`` at 1× and 10×
vertex complexity — so SCALE.md's geometry claims carry a number
instead of an adjective, and any future fast-path (e.g. an optional
shapely/JTS kernel behind the same function signatures) has a
baseline to beat.

Usage::

    python geo_kernel_bench.py [--n 300]

Prints one JSON line; paste the numbers into docs/SCALE.md §Geometry
when they move.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gis_city_county_spark.geo import kernel as K


def _blob(cx: float, cy: float, r: float, n_vertices: int, wobble: float,
          seed: int) -> "K.MultiPolygon":
    """Deterministic star-ish polygon: radius modulated by two
    incommensurate sinusoids — convex enough to be realistic, concave
    enough to exercise the clipper's general path."""
    pts = []
    for i in range(n_vertices):
        t = 2.0 * math.pi * i / n_vertices
        rr = r * (1.0 + wobble * math.sin(3 * t + seed)
                  + 0.5 * wobble * math.cos(7 * t + 2 * seed))
        pts.append((cx + rr * math.cos(t), cy + rr * math.sin(t)))
    pts.append(pts[0])
    return K.from_geojson({"type": "Polygon", "coordinates": [pts]})


def _bowtie(cx: float, cy: float, r: float) -> "K.MultiPolygon":
    """Self-intersecting quad — the make_valid repair path."""
    return K.from_geojson({
        "type": "Polygon",
        "coordinates": [[
            (cx - r, cy - r), (cx + r, cy + r), (cx + r, cy - r),
            (cx - r, cy + r), (cx - r, cy - r),
        ]],
    })


def _rate(fn, items, reps: int = 1) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for it in items:
            fn(it)
            n += 1
    return n / (time.perf_counter() - t0), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    args = ap.parse_args()

    results: dict[str, dict] = {}
    for scale, verts in (("1x", 24), ("10x", 240)):
        blobs = [_blob(i * 3.0, (i % 7) * 2.0, 1.4, verts, 0.25, i)
                 for i in range(args.n)]
        others = [_blob(i * 3.0 + 0.9, (i % 7) * 2.0 + 0.6, 1.4, verts,
                        0.25, i + 1) for i in range(args.n)]
        bowties = [_bowtie(i * 3.0, 0.0, 1.0) for i in range(args.n)]

        mv_rate, _ = _rate(K.make_valid, bowties)
        mv_clean_rate, _ = _rate(K.make_valid, blobs)
        un_rate, _ = _rate(lambda ab: K.union(*ab), list(zip(blobs, others)))
        ov_rate, _ = _rate(
            lambda ab: K._overlay(list(ab), keep=lambda ins: any(ins)),
            list(zip(blobs, others)),
        )
        results[scale] = {
            "vertices_per_ring": verts,
            "make_valid_dirty_per_sec_core": round(mv_rate, 1),
            "make_valid_clean_per_sec_core": round(mv_clean_rate, 1),
            "union_pairs_per_sec_core": round(un_rate, 1),
            "overlay_pairs_per_sec_core": round(ov_rate, 1),
        }

    print(json.dumps({"metric": "geo_kernel_throughput", "n": args.n,
                      "scales": results}))


if __name__ == "__main__":
    main()
