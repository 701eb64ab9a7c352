"""Property-based invariants for the rectilinear geometry kernel.

Random multipolygons are built as unions of random integer-coordinate
axis-aligned rectangles. The kernel's boolean ops are exact on that
domain, so algebraic identities must hold with exact double equality
(all areas are integers on integer grids — no tolerance needed).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import gis_city_county_spark.geo.kernel as K


def _rect(x0: int, y0: int, w: int, h: int) -> K.MultiPolygon:
    x1, y1 = x0 + w, y0 + h
    return [([(float(x0), float(y0)), (float(x1), float(y0)),
              (float(x1), float(y1)), (float(x0), float(y1))], [])]


rects = st.builds(
    _rect,
    st.integers(min_value=-20, max_value=20),
    st.integers(min_value=-20, max_value=20),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
)


def _shape(draw_list: list[K.MultiPolygon]) -> K.MultiPolygon:
    return K.union_all(draw_list)


shapes = st.lists(rects, min_size=1, max_size=4).map(_shape)


@settings(max_examples=60, deadline=None)
@given(shapes, shapes)
def test_inclusion_exclusion(a, b):
    """area(a∪b) + area(a∩b) == area(a) + area(b) — exact."""
    lhs = K.area(K.union(a, b)) + K.area(K.intersection(a, b))
    assert lhs == K.area(a) + K.area(b)


@settings(max_examples=60, deadline=None)
@given(shapes, shapes)
def test_difference_partition(a, b):
    """a splits into (a−b) ⊔ (a∩b): areas add exactly; the parts are
    interior-disjoint."""
    diff, inter = K.difference(a, b), K.intersection(a, b)
    assert K.area(diff) + K.area(inter) == K.area(a)
    assert K.area(K.intersection(diff, inter)) == 0.0


@settings(max_examples=60, deadline=None)
@given(shapes, shapes)
def test_commutativity(a, b):
    assert K.area(K.union(a, b)) == K.area(K.union(b, a))
    assert K.area(K.intersection(a, b)) == K.area(K.intersection(b, a))


@settings(max_examples=60, deadline=None)
@given(shapes)
def test_self_identities(a):
    assert K.area(K.union(a, a)) == K.area(a)
    assert K.area(K.intersection(a, a)) == K.area(a)
    assert K.is_empty(K.difference(a, a)) or K.area(K.difference(a, a)) == 0.0


@settings(max_examples=60, deadline=None)
@given(shapes)
def test_wkb_roundtrip_preserves_geometry(a):
    back = K.from_wkb(K.to_wkb(a))
    assert K.area(back) == K.area(a)
    assert K.bbox(back) == K.bbox(a)


@settings(max_examples=60, deadline=None)
@given(shapes, shapes)
def test_predicates_consistent_with_areas(a, b):
    """intersects ⇔ shared interior or boundary; touches ⇒ zero-area
    intersection; disjoint ⇔ not intersects."""
    inter_area = K.area(K.intersection(a, b))
    if inter_area > 0:
        assert K.intersects(a, b)
        assert not K.touches(a, b)
        assert not K.disjoint(a, b)
    if K.touches(a, b):
        assert inter_area == 0.0
        assert K.intersects(a, b)
    assert K.disjoint(a, b) == (not K.intersects(a, b))


@settings(max_examples=40, deadline=None)
@given(shapes)
def test_make_valid_idempotent_on_valid(a):
    assert K.make_valid(a) == K.make_valid(K.make_valid(a))


# ---------------------------------------------- general (rotated) domain

import math


def _rot_rect(x0: int, y0: int, w: int, h: int, deg: int) -> K.MultiPolygon:
    """Rectangle rotated about its corner by deg degrees (integer
    params, float vertices)."""
    c, s = math.cos(math.radians(deg)), math.sin(math.radians(deg))
    pts = [(0.0, 0.0), (float(w), 0.0), (float(w), float(h)), (0.0, float(h))]
    return [([(x0 + x * c - y * s, y0 + x * s + y * c) for x, y in pts], [])]


rot_rects = st.builds(
    _rot_rect,
    st.integers(min_value=-15, max_value=15),
    st.integers(min_value=-15, max_value=15),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=359),
)

rot_shapes = st.lists(rot_rects, min_size=1, max_size=3).map(K.union_all)


def _close(a: float, b: float, tol: float = 1e-6) -> bool:
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


@settings(max_examples=40, deadline=None)
@given(rot_shapes, rot_shapes)
def test_general_inclusion_exclusion(a, b):
    """area(a∪b) + area(a∩b) == area(a) + area(b) on arbitrarily
    rotated operands (float tolerance — intersections are inexact off
    the integer grid)."""
    lhs = K.area(K.union(a, b)) + K.area(K.intersection(a, b))
    assert _close(lhs, K.area(a) + K.area(b))


@settings(max_examples=40, deadline=None)
@given(rot_shapes, rot_shapes)
def test_general_difference_partition(a, b):
    diff, inter = K.difference(a, b), K.intersection(a, b)
    assert _close(K.area(diff) + K.area(inter), K.area(a))


@settings(max_examples=40, deadline=None)
@given(rot_shapes)
def test_general_self_identities(a):
    assert _close(K.area(K.union(a, a)), K.area(a))
    assert _close(K.area(K.intersection(a, a)), K.area(a))
    d = K.difference(a, a)
    assert K.is_empty(d) or _close(K.area(d), 0.0, 1e-9)


# ---------------- r3: make_valid self-intersection repair properties

ring_pts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=3,
    max_size=8,
    unique=True,
)


def _has_proper_crossing(outer, holes):
    """True when any two boundary segments cross through each other's
    INTERIOR. Tangential contact (shared vertices, collinear shared
    edges, vertex-on-edge pinches between rings) is allowed — that is
    the Esri/arcpy validity model the repair targets, and weakly-
    simple output is what GEOS buffer(0) produces too."""
    rings = [outer, *holes]
    segs = [
        (r[i], r[(i + 1) % len(r)]) for r in rings for i in range(len(r))
    ]
    xs = [p[0] for s_ in segs for p in s_]
    ys = [p[1] for s_ in segs for p in s_]
    scale = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
    tol = scale * 1e-9

    def interior(pt, a, b):
        return (
            max(abs(pt[0] - a[0]), abs(pt[1] - a[1])) > tol
            and max(abs(pt[0] - b[0]), abs(pt[1] - b[1])) > tol
        )

    for i in range(len(segs)):
        p1, p2 = segs[i]
        for j in range(i + 1, len(segs)):
            q1, q2 = segs[j]
            for pt in K._seg_points(p1, p2, q1, q2):
                if interior(pt, p1, p2) and interior(pt, q1, q2):
                    return True
    return False


@settings(max_examples=80, deadline=None)
@given(ring_pts)
def test_make_valid_output_has_no_proper_crossings(pts):
    """Any vertex sequence — including wildly self-crossing ones —
    must repair to parts whose boundaries never cross through each
    other (tangential touches allowed, per the Esri validity model),
    with CCW outers."""
    mp = [([(float(x), float(y)) for x, y in pts], [])]
    for outer, holes in K.make_valid(mp):
        assert K.ring_signed_area(outer) > 0
        assert not _has_proper_crossing(outer, holes)


@settings(max_examples=80, deadline=None)
@given(ring_pts)
def test_make_valid_is_idempotent(pts):
    mp = [([(float(x), float(y)) for x, y in pts], [])]
    once = K.make_valid(mp)
    twice = K.make_valid(once)
    assert math.isclose(K.area(twice), K.area(once), rel_tol=1e-9, abs_tol=1e-9)


def test_memberships_batch_bit_equals_scalar_testers():
    """The numpy batched crossing-parity path must agree with the
    scalar y-bucketed testers on every probe, including points outside
    the bbox, dead on edge midpoints' offsets, and degenerate
    horizontal edges (the masked divide-by-zero lanes)."""
    import math
    import random

    from gis_city_county_spark.geo.kernel import (
        _memberships_batch,
        _pip_tester,
        from_geojson,
    )

    rnd = random.Random(3)
    polys = []
    for s in range(4):
        pts = []
        n = 12 + 3 * s
        for i in range(n):
            t = 2 * math.pi * i / n
            rr = 1.0 + 0.4 * math.sin(3 * t + s)
            pts.append((rr * math.cos(t), rr * math.sin(t)))
        pts.append(pts[0])
        polys.append(from_geojson({"type": "Polygon", "coordinates": [pts]}))
    # a rectangle with exactly-horizontal edges exercises the y2==y1
    # lanes the scalar loop skips and numpy masks
    polys.append(from_geojson({
        "type": "Polygon",
        "coordinates": [[(-1, -1), (1, -1), (1, 1), (-1, 1), (-1, -1)]],
    }))
    probes = [(rnd.uniform(-2.2, 2.2), rnd.uniform(-2.2, 2.2))
              for _ in range(700)]
    probes += [(3.5, 0.0), (0.0, -3.5), (1.0, 1.0)]
    got = _memberships_batch(polys, probes, pad=1e-9)
    testers = [_pip_tester(g, 1e-9) for g in polys]
    want = [[t(x, y) for (x, y) in probes] for t in testers]
    assert got == want
