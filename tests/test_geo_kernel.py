"""Geometry kernel: codecs, measures, transforms, boolean ops,
predicates (golden micro-polygon fixtures per FIXTURES.md §7)."""

from __future__ import annotations

import math

import pytest

from gis_city_county_spark.geo import kernel as K


def rect(x0, y0, x1, y1):
    return [([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], [])]


def test_wkb_roundtrip():
    mp = [
        ([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
         [[(2.0, 2.0), (2.0, 4.0), (4.0, 4.0), (4.0, 2.0)]]),
        ([(20.0, 20.0), (25.0, 20.0), (25.0, 25.0), (20.0, 25.0)], []),
    ]
    assert K.from_wkb(K.to_wkb(mp)) == mp


def test_geojson_roundtrip():
    mp = rect(0, 0, 5, 5)
    gj = K.to_geojson(mp)
    assert gj["type"] == "MultiPolygon"
    assert K.from_geojson(gj) == mp
    # Polygon (non-multi) input also parses
    assert K.from_geojson(
        {"type": "Polygon", "coordinates": [[[0, 0], [5, 0], [5, 5], [0, 5], [0, 0]]]}
    ) == mp


def test_area_with_hole():
    mp = [
        ([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)],
         [[(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)]]),
    ]
    assert K.area(mp) == 100.0 - 4.0


def test_make_valid_fixes_orientation_and_dupes():
    # clockwise outer with a duplicate vertex and a zero-area ring
    bad = [
        ([(0.0, 0.0), (0.0, 5.0), (5.0, 5.0), (5.0, 5.0), (5.0, 0.0)], []),
        ([(7.0, 7.0), (7.0, 7.0), (8.0, 7.0)], []),
    ]
    fixed = K.make_valid(bad)
    assert len(fixed) == 1
    assert K.ring_signed_area(fixed[0][0]) > 0  # outer now CCW
    assert K.area(fixed) == 25.0


def test_union_disjoint_and_adjacent():
    a, b = rect(0, 0, 2, 2), rect(5, 0, 7, 2)
    u = K.union(a, b)
    assert len(u) == 2 and K.area(u) == 8.0
    # adjacent rectangles merge into one part
    u2 = K.union(rect(0, 0, 2, 2), rect(2, 0, 4, 2))
    assert len(u2) == 1 and K.area(u2) == 8.0


def test_union_forms_hole():
    """Four rectangles forming a frame around an empty center."""
    frame = [rect(0, 0, 6, 1), rect(0, 5, 6, 6), rect(0, 1, 1, 5), rect(5, 1, 6, 5)]
    u = K.union_all(frame)
    assert len(u) == 1
    outer, holes = u[0]
    assert len(holes) == 1
    assert K.area(u) == 36.0 - 16.0


def test_intersection_and_difference():
    a, b = rect(0, 0, 4, 4), rect(2, 2, 6, 6)
    inter = K.intersection(a, b)
    assert K.area(inter) == 4.0
    assert K.bbox(inter) == (2.0, 2.0, 4.0, 4.0)
    diff = K.difference(a, b)
    assert K.area(diff) == 12.0
    # erase everything -> empty
    assert K.is_empty(K.difference(a, K.union(a, b)))


def test_difference_creates_hole():
    outer, inner = rect(0, 0, 10, 10), rect(4, 4, 6, 6)
    d = K.difference(outer, inner)
    assert len(d) == 1 and len(d[0][1]) == 1
    assert K.area(d) == 96.0


def test_touches_vs_overlap():
    a = rect(0, 0, 2, 2)
    edge_neighbor = rect(2, 0, 4, 2)      # shares an edge
    corner_neighbor = rect(2, 2, 4, 4)    # shares a corner point
    overlapping = rect(1, 1, 3, 3)
    far = rect(10, 10, 12, 12)
    assert K.touches(a, edge_neighbor)
    assert K.touches(a, corner_neighbor)
    assert not K.touches(a, overlapping)   # interiors intersect
    assert not K.touches(a, far)
    assert K.intersects(a, overlapping)
    assert K.disjoint(a, far)
    assert not K.disjoint(a, edge_neighbor)


def test_multipart_accessors():
    mp = rect(0, 0, 1, 1) + rect(5, 5, 7, 7)
    assert K.num_parts(mp) == 2
    assert K.area(K.part(mp, 1)) == 4.0


def test_transform_3310_roundtrip_and_properties():
    # round-trip lon/lat -> Albers -> lon/lat
    for lon, lat in [(-122.4, 37.77), (-118.24, 34.05), (-120.0, 38.0)]:
        x, y = K.transform_point(lon, lat, "EPSG:4326", "EPSG:3310")
        lon2, lat2 = K.transform_point(x, y, "EPSG:3310", "EPSG:4326")
        assert math.isclose(lon, lon2, abs_tol=1e-9)
        assert math.isclose(lat, lat2, abs_tol=1e-9)
    # central meridian maps to x=0
    x, _ = K.transform_point(-120.0, 36.0, "EPSG:4326", "EPSG:3310")
    assert abs(x) < 1e-6
    # Albers is equal-area: a small square's projected area matches
    # its ellipsoidal area within 0.1%
    d = 0.01
    sq = [([(-121.0, 37.0), (-121.0 + d, 37.0), (-121.0 + d, 37.0 + d), (-121.0, 37.0 + d)], [])]
    proj = K.transform(sq, "EPSG:4326", "EPSG:3310")
    # approximate ellipsoidal patch area
    lat_m = 111132.95  # meters/degree latitude at mid-lat (GRS80 approx)
    lon_m = 111319.49 * math.cos(math.radians(37.005))
    expect = (d * lat_m) * (d * lon_m)
    assert abs(K.area(proj) - expect) / expect < 1e-3


def test_transform_3857_known_values():
    # 3857 x depends only on lon: x(180) = pi*R
    x, y = K.transform_point(180.0, 0.0, "EPSG:4326", "EPSG:3857")
    assert math.isclose(x, math.pi * 6378137.0, rel_tol=1e-12)
    assert abs(y) < 1e-6
    # route 3310 -> 3857 goes through 4326
    x3310, y3310 = K.transform_point(-120.0, 36.0, "EPSG:4326", "EPSG:3310")
    xm, ym = K.transform_point(x3310, y3310, "EPSG:3310", "EPSG:3857")
    xm2, ym2 = K.transform_point(-120.0, 36.0, "EPSG:4326", "EPSG:3857")
    assert math.isclose(xm, xm2, abs_tol=1e-6)
    assert math.isclose(ym, ym2, abs_tol=1e-6)


def test_union_all_many():
    # checkerboard strip unions into one part with no holes
    tiles = [rect(i, 0, i + 1, 1) for i in range(10)]
    u = K.union_all(tiles)
    assert len(u) == 1 and not u[0][1]
    assert K.area(u) == 10.0


@pytest.mark.parametrize("op,expected_area", [
    ("union", 28.0), ("intersection", 4.0), ("difference", 12.0),
])
def test_boolean_ops_l_shapes(op, expected_area):
    """L-shaped (concave) operands."""
    a = [([(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)], [])]
    b = rect(0, 0, 4, 4)
    # a is an L of area 12; b covers it fully
    got = getattr(K, op)(b, a) if op == "difference" else getattr(K, op)(a, b)
    if op == "union":
        assert K.area(got) == 16.0
    elif op == "intersection":
        assert K.area(got) == 12.0
    else:  # b - a: the notch
        assert K.area(got) == 4.0


# ---------------------------------------------- non-rectilinear (general)

def diamond(cx, cy, r):
    """Square rotated 45°: |x-cx| + |y-cy| <= r, area 2r²."""
    return [([(cx + r, cy), (cx, cy + r), (cx - r, cy), (cx, cy - r)], [])]


def test_rotated_union_shared_diagonal_edge():
    # two diamonds sharing a full 45° edge merge into one part
    a, b = diamond(2, 2, 2), diamond(4, 4, 2)
    u = K.union(a, b)
    assert len(u) == 1
    assert K.area(u) == 16.0
    assert K.touches(a, b)


def test_rotated_intersection_with_square():
    # diamond |x-2|+|y-2|<=2 vs square [2,4]x[0,2]: the quadrant
    # triangle (2,0),(4,2),(2,2) of area 2
    d = diamond(2, 2, 2)
    s = rect(2, 0, 4, 2)
    assert K.area(K.intersection(d, s)) == 2.0
    assert K.area(K.union(d, s)) == 10.0
    assert K.area(K.difference(d, s)) == 6.0
    assert K.area(K.difference(s, d)) == 2.0


def test_triangle_overlap():
    t1 = [([(0.0, 0.0), (6.0, 0.0), (0.0, 6.0)], [])]
    t2 = [([(2.0, 2.0), (8.0, 2.0), (2.0, 8.0)], [])]
    # overlap: x>=2, y>=2, x+y<=6 -> triangle legs 2 -> area 2
    assert K.area(K.intersection(t1, t2)) == 2.0
    assert K.area(K.union(t1, t2)) == 34.0


def test_rotated_hole():
    # diamond hole strictly inside a triangle -> one part, one hole
    tri = [([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)], [])]
    d = K.difference(tri, diamond(3, 3, 2))
    assert len(d) == 1 and len(d[0][1]) == 1
    assert K.area(d) == 50.0 - 8.0


def test_general_touches_point_and_edge():
    a = diamond(2, 2, 2)
    vertex_neighbor = diamond(6, 2, 2)          # shares vertex (4,2)
    edge_neighbor = diamond(4, 4, 2)            # shares 45° edge
    crossing = rect(3, 1, 7, 3)                 # interiors overlap
    assert K.touches(a, vertex_neighbor)
    assert K.touches(a, edge_neighbor)
    assert not K.touches(a, crossing)
    assert K.intersects(a, crossing)


def test_partial_collinear_edge_overlap():
    # b's bottom edge covers only the middle of a's top edge
    a = rect(0, 0, 10, 2)
    b = rect(3, 2, 7, 4)
    u = K.union(a, b)
    assert len(u) == 1 and K.area(u) == 28.0
    assert K.touches(a, b)
    inter = K.intersection(a, b)
    assert K.area(inter) == 0.0


def test_high_vertex_count_against_analytic_area():
    """Two 400-gon circles: the clipped lens area must match the
    closed-form circle-overlap formula (within polygonal
    discretization error ~ O(n^-2))."""
    n, r, d = 400, 10.0, 8.0
    def circle(cx):
        return [([(cx + r * math.cos(2 * math.pi * i / n),
                   r * math.sin(2 * math.pi * i / n)) for i in range(n)], [])]
    a, b = circle(0.0), circle(d)
    lens = 2 * r * r * math.acos(d / (2 * r)) - (d / 2) * math.sqrt(4 * r * r - d * d)
    got = K.area(K.intersection(a, b))
    assert abs(got - lens) / lens < 1e-3
    # inclusion-exclusion holds on the same operands
    union_area = K.area(K.union(a, b))
    poly_area = K.area(a)  # polygonal circle area (slightly under pi r^2)
    assert abs(union_area + got - 2 * poly_area) < 1e-6 * poly_area


# ------------------------- G1 self-intersection repair (r3, VERDICT 6)
# arcpy RepairGeometry splits invalid rings into valid multipolygons
# (reference bunny.py:221-226); the kernel routes dirty parts through
# the planar overlay with an identity keep-rule.


def test_make_valid_splits_bowtie():
    # (0,0)→(2,2)→(2,0)→(0,2) crosses itself at (1,1); its SIGNED area
    # is exactly 0, so the pre-r3 cleanup silently dropped it.
    bow = [([(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0)], [])]
    v = K.make_valid(bow)
    assert len(v) == 2
    assert K.area(v) == pytest.approx(2.0)
    # both lobes are simple triangles, outer-CCW
    for outer, holes in v:
        assert len(outer) == 3 and not holes
        assert K.ring_signed_area(outer) > 0


def test_make_valid_splits_pinched_figure_eight():
    f8 = [([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
            (0.0, 0.0), (-1.0, 0.0), (-1.0, -1.0), (0.0, -1.0)], [])]
    v = K.make_valid(f8)
    assert len(v) == 2
    assert K.area(v) == pytest.approx(2.0)


def test_make_valid_clips_hole_crossing_outer():
    # hole [3,5]x[1,3] sticks outside the [0,4]^2 outer: structure-style
    # repair keeps outer − (hole ∩ outer) and discards the overhang
    hx = [([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)],
           [[(3.0, 1.0), (5.0, 1.0), (5.0, 3.0), (3.0, 3.0)]])]
    v = K.make_valid(hx)
    assert K.area(v) == pytest.approx(14.0)


def test_make_valid_keeps_valid_geometry_untouched():
    donut = [([(0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (0.0, 6.0)],
              [[(2.0, 2.0), (2.0, 4.0), (4.0, 4.0), (4.0, 2.0)]])]
    assert K.make_valid(donut) == donut


def test_repaired_bowtie_flows_through_union_and_difference():
    bow = K.make_valid(
        [([(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0)], [])]
    )
    # union with a square covering the right lobe only
    sq = rect(1, 0, 2, 2)
    u = K.union(bow, sq)
    assert K.area(u) == pytest.approx(K.area(bow) + 2.0 - 1.0)
    # erase the right lobe: difference leaves exactly the left lobe
    d = K.difference(bow, sq)
    assert K.area(d) == pytest.approx(1.0)
    assert K.intersects(d, rect(0, 0, 0.5, 2)) is True
