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
