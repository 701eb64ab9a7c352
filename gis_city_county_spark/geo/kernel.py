"""Self-contained geometry kernel (no Sedona/Shapely in this env).

Backs the engine's geometry operators (SURVEY.md §2.7-2.8). Geometry
values are MultiPolygons in nested-tuple form::

    multipolygon := [polygon, ...]
    polygon      := (outer_ring, [hole_ring, ...])
    ring         := [(x, y), ...]   # closed implicitly; no repeat last

Codecs: ISO WKB (Polygon=3, MultiPolygon=6, little-endian) and GeoJSON
dicts — both public formats.

CRS transforms use the published projection formulas:
- EPSG:3310 California Albers (NAD83/GRS80 ellipsoidal Albers
  equal-area conic: standard parallels 34N/40.5N, origin 0N 120W,
  false northing -4,000,000)
- EPSG:3857 spherical Web Mercator

Boolean ops (union/intersection/difference) work on GENERAL polygons
via planar-arrangement overlay: split every ring edge of every operand
at its pairwise intersections (including collinear-overlap endpoints),
classify each resulting edge by even-odd membership of the two points
just left/right of its midpoint w.r.t. each original operand, keep the
edges where the boolean verdict differs across sides (directed so the
result interior lies on the left), and stitch them into rings. Shared
and overlapping boundary segments — exactly what `touches` and the
sliver fix exercise — subdivide into single edges whose two sides are
classified independently, so degenerate contact resolves without
special-casing. Axis-parallel crossings are computed exactly (the
crossing reuses the parallel segment's own coordinate), so on integer
rectilinear inputs all results — and the algebraic identities the
property suite asserts — remain bit-exact, while rotated/irregular
polygons now clip correctly too. Complexity is O(S² + E·V) per call
(S input segments, E result edges, V operand vertices): geometries are
per-row values; scale-out belongs to the grid-partitioned spatial
joins in ``geo/ops.py``, the kernel only ever sees one feature
pair/group.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Sequence

Ring = Sequence[tuple[float, float]]
Polygon = tuple[Ring, list[Ring]]
MultiPolygon = list[Polygon]

# ------------------------------------------------------------------ codecs

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def _norm_ring(coords: Sequence[Sequence[float]]) -> list[tuple[float, float]]:
    pts = [(float(x), float(y)) for x, y in coords]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return pts


def from_geojson(obj: dict) -> MultiPolygon:
    """GeoJSON geometry dict -> MultiPolygon form."""
    t = obj["type"]
    if t == "Polygon":
        rings = [_norm_ring(r) for r in obj["coordinates"]]
        return [(rings[0], rings[1:])] if rings else []
    if t == "MultiPolygon":
        out: MultiPolygon = []
        for poly in obj["coordinates"]:
            rings = [_norm_ring(r) for r in poly]
            if rings:
                out.append((rings[0], rings[1:]))
        return out
    raise ValueError(f"unsupported GeoJSON type: {t}")


def to_geojson(mp: MultiPolygon) -> dict:
    def close(r: Ring) -> list[list[float]]:
        pts = [[x, y] for x, y in r]
        return pts + [pts[0]] if pts else pts

    return {
        "type": "MultiPolygon",
        "coordinates": [[close(outer)] + [close(h) for h in holes] for outer, holes in mp],
    }


def to_wkb(mp: MultiPolygon) -> bytes:
    """Serialize as little-endian ISO WKB MultiPolygon."""
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(mp))]
    for outer, holes in mp:
        rings = [outer, *holes]
        out.append(struct.pack("<BII", 1, _WKB_POLYGON, len(rings)))
        for r in rings:
            pts = list(r) + [r[0]]  # WKB rings repeat the first point
            out.append(struct.pack("<I", len(pts)))
            for x, y in pts:
                out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def from_wkb(buf: bytes) -> MultiPolygon:
    pos = 0

    def u8() -> int:
        nonlocal pos
        v = buf[pos]
        pos += 1
        return v

    def u32(bo: str) -> int:
        nonlocal pos
        v = struct.unpack_from("<I" if bo == "<" else ">I", buf, pos)[0]
        pos += 4
        return v

    def f64pair(bo: str) -> tuple[float, float]:
        nonlocal pos
        v = struct.unpack_from("<dd" if bo == "<" else ">dd", buf, pos)
        pos += 16
        return v  # type: ignore[return-value]

    def read_polygon(bo: str) -> Polygon:
        n_rings = u32(bo)
        rings = []
        for _ in range(n_rings):
            n_pts = u32(bo)
            pts = [f64pair(bo) for _ in range(n_pts)]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            rings.append(pts)
        return (rings[0], rings[1:]) if rings else ([], [])

    def read_geom() -> MultiPolygon:
        bo = "<" if u8() == 1 else ">"
        gtype = u32(bo) & 0xFF  # mask any SRID/dimension flags
        if gtype == _WKB_POLYGON:
            return [read_polygon(bo)]
        if gtype == _WKB_MULTIPOLYGON:
            n = u32(bo)
            out = []
            for _ in range(n):
                out.extend(read_geom())
            return out
        raise ValueError(f"unsupported WKB type {gtype}")

    return read_geom()


# ------------------------------------------------------------------ measures

def ring_signed_area(r: Ring) -> float:
    """Shoelace; positive = counter-clockwise."""
    n = len(r)
    if n < 3:
        return 0.0
    s = 0.0
    for i in range(n):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def area(mp: MultiPolygon) -> float:
    """Planar area: outers minus holes (ring orientation ignored)."""
    total = 0.0
    for outer, holes in mp:
        total += abs(ring_signed_area(outer))
        for h in holes:
            total -= abs(ring_signed_area(h))
    return total


def bbox(mp: MultiPolygon) -> tuple[float, float, float, float]:
    xs = [p[0] for outer, _ in mp for p in outer]
    ys = [p[1] for outer, _ in mp for p in outer]
    return (min(xs), min(ys), max(xs), max(ys))


def num_parts(mp: MultiPolygon) -> int:
    return len(mp)


def part(mp: MultiPolygon, i: int) -> MultiPolygon:
    return [mp[i]]


def is_empty(mp: MultiPolygon) -> bool:
    return not mp or all(len(outer) < 3 for outer, _ in mp)


# ------------------------------------------------------------------ validity

def make_valid(mp: MultiPolygon) -> MultiPolygon:
    """G1 RepairGeometry-equivalent cleanup for the kernel's domain
    (reference ``bunny.py:221-226``):

    * drop consecutive duplicate vertices and degenerate (<3 pt /
      zero-area) rings; normalize orientation (outer CCW, holes CW);
    * **split self-intersecting rings** (r3): a part whose rings cross
      themselves or each other — a bowtie, a figure-eight pinched at a
      shared vertex, a hole crossing its outer — is re-run through the
      planar-overlay arrangement with an identity keep-rule, i.e. the
      even-odd interior of the part's own edge set.  A bowtie thereby
      becomes a valid two-part multipolygon, matching arcpy
      ``RepairGeometry``.  Parts are repaired independently
      (overlapping *parts* of one multipolygon are not dissolved)."""
    out: MultiPolygon = []
    for outer, holes in mp:
        o = _dedupe(outer)
        if len(o) < 3:
            continue
        hs = [hh for hh in (_dedupe(h) for h in holes) if len(hh) >= 3]
        if _part_self_intersects(o, hs):
            # Even-odd interior of the outer's own edge set, minus the
            # even-odd interior of the holes — a bowtie's lobes (whose
            # SIGNED areas cancel to zero) come back as separate valid
            # parts; a hole crossing its outer clips to the overlap
            # (structure-style repair, like arcpy not GEOS-linework).
            shell = [(o, [])]
            if hs:
                hole_mp: MultiPolygon = [(h, []) for h in hs]
                repaired = _overlay(
                    [shell, hole_mp], lambda m: m[0] and not m[1]
                )
            else:
                repaired = _overlay([shell], lambda m: m[0])
            out.extend(_split_pinched_parts(repaired))
            continue
        # simple ring: degenerate drop + orientation normalization
        if ring_signed_area(o) == 0.0:
            continue
        if ring_signed_area(o) < 0:
            o = list(reversed(o))
        hs2 = []
        for hh in hs:
            if ring_signed_area(hh) == 0.0:
                continue
            if ring_signed_area(hh) > 0:
                hh = list(reversed(hh))
            hs2.append(hh)
        out.append((o, hs2))
    return out


def _split_ring_at_repeats(r: Ring) -> list[Ring]:
    """Loop extraction: a ring that revisits a vertex (a pinch point —
    the overlay stitcher can emit a figure-eight as ONE ring through
    the shared vertex) splits into its constituent simple loops."""
    out: list[Ring] = []
    stack: list[tuple[float, float]] = []
    pos: dict[tuple[float, float], int] = {}
    for p in r:
        if p in pos:
            i = pos[p]
            loop = stack[i:]
            if len(loop) >= 3:
                out.append(loop)
            for q in stack[i:]:
                pos.pop(q, None)
            del stack[i:]
        stack.append(p)
        pos[p] = len(stack) - 1
    if len(stack) >= 3:
        out.append(stack)
    return out


def _renode_vertex_on_edge(r: Ring) -> Ring:
    """Insert any ring vertex that lies in the interior of another of
    the ring's edges into that edge, so a vertex-on-edge pinch (which
    ``_merge_collinear`` can hide by dropping the collinear inserted
    node) becomes a repeated-vertex pinch that loop extraction can
    split."""
    xs = [p[0] for p in r]
    ys = [p[1] for p in r]
    scale = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
    tol = scale * 1e-9
    verts = set(r)
    out: list[tuple[float, float]] = []
    n = len(r)
    for i in range(n):
        a, b = r[i], r[(i + 1) % n]
        out.append(a)
        dx, dy = b[0] - a[0], b[1] - a[1]
        ln2 = dx * dx + dy * dy
        if ln2 == 0.0:
            continue
        hits = []
        for v in verts:
            if v == a or v == b:
                continue
            t = ((v[0] - a[0]) * dx + (v[1] - a[1]) * dy) / ln2
            if t <= 0.0 or t >= 1.0:
                continue
            px, py = a[0] + t * dx, a[1] + t * dy
            if abs(px - v[0]) <= tol and abs(py - v[1]) <= tol:
                hits.append((t, v))
        for _, v in sorted(hits):
            out.append(v)
    return out


def _split_pinched_parts(mp: MultiPolygon) -> MultiPolygon:
    """Apply loop extraction to every outer ring, reattaching each
    hole to the loop that contains it."""
    out: MultiPolygon = []
    for outer, holes in mp:
        loops = _split_ring_at_repeats(_renode_vertex_on_edge(outer))
        if not loops:  # every extracted loop degenerate — drop the part
            continue
        if len(loops) == 1:
            out.append((loops[0], holes))
            continue
        parts = [(lp, []) for lp in loops]
        for h in holes:
            hx, hy = h[0]
            for lp, lp_holes in parts:
                if _point_in([(lp, [])], hx, hy):
                    lp_holes.append(h)
                    break
        out.extend(parts)
    return out


def _part_self_intersects(outer: Ring, holes: list[Ring]) -> bool:
    """True when a part's rings cross themselves / each other anywhere
    other than a shared endpoint, or revisit a vertex (pinch point).

    Candidate segment pairs come from the same uniform grid hash the
    overlay uses — this runs for EVERY part on the ``make_valid`` hot
    path (including the common valid case), so an all-pairs scan
    would cost O(n²) per 10k-vertex coastline ring; grid bucketing
    keeps it near-linear for well-separated segments."""
    rings = [outer, *holes]
    for r in rings:
        if len(set(r)) < len(r):  # pinched (repeated vertex) ring
            return True
    segs = [
        (r[i], r[(i + 1) % len(r)]) for r in rings for i in range(len(r))
    ]
    xs = [p[0] for s in segs for p in s]
    ys = [p[1] for s in segs for p in s]
    scale = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
    tol = scale * 1e-9

    def near(p, q) -> bool:
        return abs(p[0] - q[0]) <= tol and abs(p[1] - q[1]) <= tol

    boxes = [
        (
            min(p1[0], p2[0]) - tol,
            min(p1[1], p2[1]) - tol,
            max(p1[0], p2[0]) + tol,
            max(p1[1], p2[1]) + tol,
        )
        for p1, p2 in segs
    ]
    n = len(segs)
    cell = max(scale / max(int(math.sqrt(n)) + 1, 8), tol * 16)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (bx1, by1, bx2, by2) in enumerate(boxes):
        for gx in range(int(bx1 // cell), int(bx2 // cell) + 1):
            for gy in range(int(by1 // cell), int(by2 // cell) + 1):
                buckets.setdefault((gx, gy), []).append(i)
    seen: set[tuple[int, int]] = set()
    for members in buckets.values():
        m = len(members)
        for a_i in range(m):
            i = members[a_i]
            p1, p2 = segs[i]
            bx1, by1, bx2, by2 = boxes[i]
            for b_i in range(a_i + 1, m):
                j = members[b_i]
                pair = (i, j) if i < j else (j, i)
                if pair in seen:
                    continue
                seen.add(pair)
                cx1, cy1, cx2, cy2 = boxes[j]
                if cx1 > bx2 or cx2 < bx1 or cy1 > by2 or cy2 < by1:
                    continue
                q1, q2 = segs[j]
                for pt in _seg_points(p1, p2, q1, q2):
                    if not (
                        (near(pt, p1) or near(pt, p2))
                        and (near(pt, q1) or near(pt, q2))
                    ):
                        return True
    return False


def _dedupe(r: Ring) -> list[tuple[float, float]]:
    pts = []
    for p in r:
        if not pts or p != pts[-1]:
            pts.append(p)
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts.pop()
    return pts


# ------------------------------------------------------------------ CRS

# GRS80 ellipsoid
_A = 6378137.0
_E2 = 0.0066943800229007876
_E = math.sqrt(_E2)


def _q(phi: float) -> float:
    s = math.sin(phi)
    return (1 - _E2) * (s / (1 - _E2 * s * s) - (1 / (2 * _E)) * math.log((1 - _E * s) / (1 + _E * s)))


class _Albers:
    """Ellipsoidal Albers equal-area conic (Snyder 1987, eqs 14-1..14-12)."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 fe: float, fn: float):
        p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
        m1 = math.cos(p1) / math.sqrt(1 - _E2 * math.sin(p1) ** 2)
        m2 = math.cos(p2) / math.sqrt(1 - _E2 * math.sin(p2) ** 2)
        q1, q2, q0 = _q(p1), _q(p2), _q(p0)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.c = m1 * m1 + self.n * q1
        self.rho0 = _A * math.sqrt(self.c - self.n * q0) / self.n
        self.lon0 = math.radians(lon0)
        self.fe, self.fn = fe, fn

    def forward(self, lon: float, lat: float) -> tuple[float, float]:
        phi, lam = math.radians(lat), math.radians(lon)
        rho = _A * math.sqrt(self.c - self.n * _q(phi)) / self.n
        theta = self.n * (lam - self.lon0)
        return (self.fe + rho * math.sin(theta), self.fn + self.rho0 - rho * math.cos(theta))

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        x -= self.fe
        y = self.rho0 - (y - self.fn)
        rho = math.hypot(x, y)
        theta = math.atan2(x, y)
        if self.n < 0:
            rho, theta = -rho, math.atan2(-x, -y)
        q = (self.c - (rho * self.n / _A) ** 2) / self.n
        phi = math.asin(max(-1.0, min(1.0, q / 2)))
        for _ in range(10):  # Snyder 3-8 iteration
            s = math.sin(phi)
            phi = phi + ((1 - _E2 * s * s) ** 2 / (2 * math.cos(phi))) * (
                q / (1 - _E2)
                - s / (1 - _E2 * s * s)
                + (1 / (2 * _E)) * math.log((1 - _E * s) / (1 + _E * s))
            )
        return (math.degrees(theta / self.n + self.lon0), math.degrees(phi))


_EPSG3310 = _Albers(34.0, 40.5, 0.0, -120.0, 0.0, -4_000_000.0)
_R_MERC = 6378137.0


def _fwd_3857(lon: float, lat: float) -> tuple[float, float]:
    x = _R_MERC * math.radians(lon)
    y = _R_MERC * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
    return (x, y)


def _inv_3857(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / _R_MERC)
    lat = math.degrees(2 * math.atan(math.exp(y / _R_MERC)) - math.pi / 2)
    return (lon, lat)


_FORWARD = {
    ("EPSG:4326", "EPSG:3310"): _EPSG3310.forward,
    ("EPSG:3310", "EPSG:4326"): _EPSG3310.inverse,
    ("EPSG:4326", "EPSG:3857"): _fwd_3857,
    ("EPSG:3857", "EPSG:4326"): _inv_3857,
}


def transform_point(x: float, y: float, src: str, dst: str) -> tuple[float, float]:
    if src == dst:
        return (x, y)
    fn = _FORWARD.get((src, dst))
    if fn is not None:
        return fn(x, y)
    # route through 4326
    lon, lat = _FORWARD[(src, "EPSG:4326")](x, y)
    return _FORWARD[("EPSG:4326", dst)](lon, lat)


def transform(mp: MultiPolygon, src: str, dst: str) -> MultiPolygon:
    """G2 Project (reference ``bunny.py:475-498``)."""
    if src == dst:
        return mp
    return [
        (
            [transform_point(x, y, src, dst) for x, y in outer],
            [[transform_point(x, y, src, dst) for x, y in h] for h in holes],
        )
        for outer, holes in mp
    ]


# --------------------------------------------- general boolean ops (overlay)

def _edges(mp: MultiPolygon):
    for outer, holes in mp:
        for r in [outer, *holes]:
            n = len(r)
            for i in range(n):
                yield r[i], r[(i + 1) % n]


def _crossings_parity(edges, x: float, y: float) -> bool:
    """Even-odd crossing parity of the ray from (x, y) toward +x over
    an edge list — the ONE implementation of the crossing rule, shared
    by every point-in-polygon path so cached testers can never
    desynchronize from the naive scan."""
    inside = False
    for (x1, y1), (x2, y2) in edges:
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xi:
                inside = not inside
    return inside


def _point_in(mp: MultiPolygon, x: float, y: float) -> bool:
    """Even-odd crossing test (point assumed off all edges)."""
    return _crossings_parity(_edges(mp), x, y)


def _pip_tester(g: MultiPolygon, pad: float):
    """Build a fast even-odd point-in-polygon test for one operand:
    bbox quick-reject + y-bucketed edge index. Falls back to the plain
    scan for tiny rings. Bit-equal to :func:`_point_in` by
    construction: identical crossing rule over an edge subset that
    provably contains every edge spanning the query y."""
    edges = list(_edges(g))
    if not edges:
        return lambda x, y: False
    pts = [p for outer, hs in g for r in [outer, *hs] for p in r]
    bx1 = min(p[0] for p in pts) - 2 * pad
    by1 = min(p[1] for p in pts) - 2 * pad
    bx2 = max(p[0] for p in pts) + 2 * pad
    by2 = max(p[1] for p in pts) + 2 * pad
    if len(edges) < 24:
        def small(x: float, y: float) -> bool:
            if not (bx1 <= x <= bx2 and by1 <= y <= by2):
                return False
            return _crossings_parity(edges, x, y)

        return small

    nb = max(int(math.isqrt(len(edges))), 4)
    span = (by2 - by1) or 1.0
    buckets: list[list[tuple[tuple[float, float], tuple[float, float]]]] = [
        [] for _ in range(nb)
    ]
    for e in edges:
        (x1, y1), (x2, y2) = e
        lo = int((min(y1, y2) - by1) / span * nb)
        hi = int((max(y1, y2) - by1) / span * nb)
        for b in range(max(lo, 0), min(hi, nb - 1) + 1):
            buckets[b].append(e)

    def fast(x: float, y: float) -> bool:
        if not (bx1 <= x <= bx2 and by1 <= y <= by2):
            return False
        b = int((y - by1) / span * nb)
        if b < 0 or b >= nb:
            return False
        return _crossings_parity(buckets[b], x, y)

    return fast


def _snap_factory(tol: float):
    """Point registry: coordinates within ``tol`` of an already-seen
    point snap to it, so intersection points computed from different
    segment pairs (which can differ in the last ulp) coincide."""
    grid: dict[tuple[int, int], tuple[float, float]] = {}

    def snap(p: tuple[float, float]) -> tuple[float, float]:
        x, y = p
        ix, iy = round(x / tol), round(y / tol)
        for dx in (0, -1, 1):
            for dy in (0, -1, 1):
                q = grid.get((ix + dx, iy + dy))
                if q is not None and abs(q[0] - x) <= tol and abs(q[1] - y) <= tol:
                    return q
        grid[(ix, iy)] = (x, y)
        return (x, y)

    return snap


def _seg_points(p1, p2, q1, q2) -> list[tuple[float, float]]:
    """Points where segment p1-p2 meets segment q1-q2: [] if none,
    one point for a proper crossing or endpoint contact, up to four
    for a collinear overlap (the endpoints of each segment that lie
    within the other's span)."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = q2[0] - q1[0], q2[1] - q1[1]
    l1, l2 = math.hypot(d1x, d1y), math.hypot(d2x, d2y)
    if l1 == 0.0 or l2 == 0.0:
        return []
    ex, ey = q1[0] - p1[0], q1[1] - p1[1]
    denom = d1x * d2y - d1y * d2x
    if abs(denom) > 1e-12 * l1 * l2:
        t = (ex * d2y - ey * d2x) / denom
        u = (ex * d1y - ey * d1x) / denom
        if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
            x, y = p1[0] + t * d1x, p1[1] + t * d1y
            # Axis-parallel operands pin the crossing exactly — keeps
            # integer-grid rectilinear results (and the exact algebraic
            # identities the property suite asserts) bit-precise.
            if d1x == 0.0:
                x = p1[0]
            elif d2x == 0.0:
                x = q1[0]
            if d1y == 0.0:
                y = p1[1]
            elif d2y == 0.0:
                y = q1[1]
            return [(x, y)]
        return []
    # parallel: collinear only if q1 sits on p's carrier line
    if abs(ex * d1y - ey * d1x) > 1e-12 * l1 * (math.hypot(ex, ey) + l2):
        return []
    out = []
    ll = l1 * l1
    for q in (q1, q2):
        t = ((q[0] - p1[0]) * d1x + (q[1] - p1[1]) * d1y) / ll
        if -1e-12 <= t <= 1 + 1e-12:
            out.append(q)
    mm = l2 * l2
    for p in (p1, p2):
        u = ((p[0] - q1[0]) * d2x + (p[1] - q1[1]) * d2y) / mm
        if -1e-12 <= u <= 1 + 1e-12:
            out.append(p)
    return out


def _merge_collinear(r: list[tuple[float, float]]) -> list[tuple[float, float]]:
    out: list[tuple[float, float]] = []
    n = len(r)
    for i in range(n):
        prev, cur, nxt = r[i - 1], r[i], r[(i + 1) % n]
        v1 = (cur[0] - prev[0], cur[1] - prev[1])
        v2 = (nxt[0] - cur[0], nxt[1] - cur[1])
        cross = v1[0] * v2[1] - v1[1] * v2[0]
        if abs(cross) > 1e-12 * math.hypot(*v1) * math.hypot(*v2):
            out.append(cur)
    return out


def _stitch(directed: list[tuple[tuple[float, float], tuple[float, float]]]):
    """Stitch directed edges (result interior on the LEFT) into rings.
    At junction vertices prefer the sharpest RIGHT turn relative to the
    incoming direction — the general-angle analogue of the previous
    rectilinear kernel's preference, so pinch-vertex behavior (e.g.
    diagonally-touching squares union into one self-touching ring) is
    unchanged."""
    out_map: dict[tuple[float, float], list[tuple[float, float]]] = {}
    for p, q in directed:
        out_map.setdefault(p, []).append(q)
    used: set[tuple[tuple[float, float], tuple[float, float]]] = set()
    rings: list[list[tuple[float, float]]] = []
    for e0 in sorted(directed):
        if e0 in used:
            continue
        ring = [e0[0]]
        cur = e0
        while True:
            used.add(cur)
            p, q = cur
            ring.append(q)
            cands = [r for r in out_map.get(q, ()) if (q, r) not in used]
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                dx, dy = q[0] - p[0], q[1] - p[1]

                def ang(r):
                    rx, ry = r[0] - q[0], r[1] - q[1]
                    # atan2(cross, dot): most negative = sharpest right
                    # turn; a u-turn lands at +pi = least preferred.
                    return math.atan2(dx * ry - dy * rx, dx * rx + dy * ry)

                nxt = min(cands, key=ang)
            cur = (q, nxt)
            if cur == e0:
                break
        if ring[0] == ring[-1]:
            ring.pop()
        ring = _merge_collinear(ring)
        if len(ring) >= 3:
            rings.append(ring)
    return rings


def _assemble(rings: list[list[tuple[float, float]]]) -> MultiPolygon:
    """CCW rings are outers, CW rings are holes of their smallest
    containing outer (representative point just right of the hole's
    first directed edge, which has result-interior on the left)."""
    outers: list[tuple[list[tuple[float, float]], float]] = []
    holes: list[list[tuple[float, float]]] = []
    for r in rings:
        sa = ring_signed_area(r)
        if sa > 0:
            outers.append((r, sa))
        elif sa < 0:
            holes.append(r)
    result: MultiPolygon = [(r, []) for r, _ in outers]
    for h in holes:
        (hx1, hy1), (hx2, hy2) = h[0], h[1]
        mx, my = (hx1 + hx2) / 2, (hy1 + hy2) / 2
        dx, dy = hx2 - hx1, hy2 - hy1
        ln = math.hypot(dx, dy)
        eps = ln / 1e6  # scale-relative: survives float precision at map coords
        px, py = mx + dy / ln * eps, my - dx / ln * eps
        best = None
        best_area = math.inf
        for idx, (outer, sa) in enumerate(outers):
            if sa < best_area and _point_in([(outer, [])], px, py):
                best, best_area = idx, sa
        if best is not None:
            result[best][1].append(h)
    return result


def _overlay(operands: Sequence[MultiPolygon], keep) -> MultiPolygon:
    """Planar-arrangement overlay: ``keep(memberships) -> bool`` maps a
    per-operand membership vector to result membership; the result
    boundary is exactly the set of subdivided edges whose two sides
    disagree."""
    pts_all = [
        p
        for g in operands
        for outer, hs in g
        for r in [outer, *hs]
        for p in r
    ]
    if not pts_all:
        return []
    xs = [p[0] for p in pts_all]
    ys = [p[1] for p in pts_all]
    scale = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
    tol = scale * 1e-9
    snap = _snap_factory(tol)

    segs: list[tuple[tuple[float, float], tuple[float, float]]] = []
    for g in operands:
        for p1, p2 in _edges(g):
            a, b = snap(p1), snap(p2)
            if a != b:
                segs.append((a, b))

    n = len(segs)
    splits: list[set[tuple[float, float]]] = [set() for _ in range(n)]
    boxes = [
        (
            min(p1[0], p2[0]) - tol,
            min(p1[1], p2[1]) - tol,
            max(p1[0], p2[0]) + tol,
            max(p1[1], p2[1]) + tol,
        )
        for p1, p2 in segs
    ]
    # Candidate pairs via a uniform grid hash on segment bboxes —
    # O(S²) pair enumeration only survives inside shared cells, so a
    # dissolve over many mutually-disjoint parts stays near-linear.
    cell = max(scale / max(int(math.sqrt(n)) + 1, 8), tol * 16)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (bx1, by1, bx2, by2) in enumerate(boxes):
        for gx in range(int(bx1 // cell), int(bx2 // cell) + 1):
            for gy in range(int(by1 // cell), int(by2 // cell) + 1):
                buckets.setdefault((gx, gy), []).append(i)
    seen_pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        m = len(members)
        for a_i in range(m):
            i = members[a_i]
            bx1, by1, bx2, by2 = boxes[i]
            p1, p2 = segs[i]
            for b_i in range(a_i + 1, m):
                j = members[b_i]
                pair = (i, j) if i < j else (j, i)
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
                cx1, cy1, cx2, cy2 = boxes[j]
                if cx1 > bx2 or cx2 < bx1 or cy1 > by2 or cy2 < by1:
                    continue
                q1, q2 = segs[j]
                for pt in _seg_points(p1, p2, q1, q2):
                    s = snap(pt)
                    if s != p1 and s != p2:
                        splits[i].add(s)
                    if s != q1 and s != q2:
                        splits[j].add(s)

    edges: set[tuple[tuple[float, float], tuple[float, float]]] = set()
    for (p1, p2), sp in zip(segs, splits):
        chain = [
            p1,
            *sorted(sp, key=lambda p: (p[0] - p1[0]) ** 2 + (p[1] - p1[1]) ** 2),
            p2,
        ]
        for a, b in zip(chain, chain[1:]):
            if a != b:
                edges.add((a, b) if a <= b else (b, a))

    eps = scale * 1e-7
    edge_list = sorted(edges)
    probes: list[tuple[float, float]] = []
    for a, b in edge_list:
        mx, my = (a[0] + b[0]) / 2, (a[1] + b[1]) / 2
        dx, dy = b[0] - a[0], b[1] - a[1]
        ln = math.hypot(dx, dy)
        ox, oy = -dy / ln * eps, dx / ln * eps  # left-side offset
        probes.append((mx + ox, my + oy))
        probes.append((mx - ox, my - oy))

    # Membership of every probe in every operand.  The numpy path
    # evaluates the SAME crossing-parity expression as
    # ``_crossings_parity`` elementwise in float64 (IEEE-identical to
    # the scalar loop — verified bit-for-bit by
    # tests/test_geo_properties.py), chunked so the probes×edges
    # matrix stays bounded; the scalar path remains both the fallback
    # and the definition.
    flags = _memberships_batch(operands, probes, eps)

    directed: list[tuple[tuple[float, float], tuple[float, float]]] = []
    for i, (a, b) in enumerate(edge_list):
        kl = keep([f[2 * i] for f in flags])
        kr = keep([f[2 * i + 1] for f in flags])
        if kl and not kr:
            directed.append((a, b))
        elif kr and not kl:
            directed.append((b, a))
    if not directed:
        return []
    return _assemble(_stitch(directed))


def _memberships_batch(
    operands: Sequence[MultiPolygon],
    probes: list[tuple[float, float]],
    pad: float,
) -> list[list[bool]]:
    """Per-operand even-odd membership flags for a probe batch.

    numpy evaluates ``xi = x1 + (y − y1)·(x2 − x1)/(y2 − y1)`` and the
    two comparisons over the probes×edges grid — float64 elementwise,
    the identical IEEE ops the scalar ``_crossings_parity`` performs,
    so parity (a popcount of exact comparisons) cannot differ.  Probe
    chunks of 512 bound the grid at 512×|edges| doubles.  Without
    numpy, falls back to the y-bucketed scalar testers."""
    try:
        import numpy as np
    except ImportError:  # pragma: no cover - numpy is a baked-in dep
        testers = [_pip_tester(g, pad) for g in operands]
        return [[t(x, y) for (x, y) in probes] for t in testers]

    px = np.array([p[0] for p in probes], dtype=np.float64)
    py = np.array([p[1] for p in probes], dtype=np.float64)
    out: list[list[bool]] = []
    for g in operands:
        edges = list(_edges(g))
        if not edges:
            out.append([False] * len(probes))
            continue
        pts = [p for outer, hs in g for r in [outer, *hs] for p in r]
        bx1 = min(p[0] for p in pts) - 2 * pad
        by1 = min(p[1] for p in pts) - 2 * pad
        bx2 = max(p[0] for p in pts) + 2 * pad
        by2 = max(p[1] for p in pts) + 2 * pad
        x1 = np.array([e[0][0] for e in edges])
        y1 = np.array([e[0][1] for e in edges])
        x2 = np.array([e[1][0] for e in edges])
        y2 = np.array([e[1][1] for e in edges])
        inside = np.zeros(len(probes), dtype=bool)
        inbox = (bx1 <= px) & (px <= bx2) & (by1 <= py) & (py <= by2)
        for lo in range(0, len(probes), 512):
            hi = min(lo + 512, len(probes))
            cy = py[lo:hi, None]
            cx = px[lo:hi, None]
            spans = (y1[None, :] > cy) != (y2[None, :] > cy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = x1[None, :] + (cy - y1[None, :]) * (
                    x2[None, :] - x1[None, :]
                ) / (y2[None, :] - y1[None, :])
            crossings = spans & (cx < xi)
            inside[lo:hi] = (crossings.sum(axis=1) % 2).astype(bool)
        out.append(list(inside & inbox))
    return out


def union(a: MultiPolygon, b: MultiPolygon) -> MultiPolygon:
    """G8 geometry union (reference ``coastline.py:145-146``)."""
    return _overlay([a, b], any)


def intersection(a: MultiPolygon, b: MultiPolygon) -> MultiPolygon:
    return _overlay([a, b], all)


def difference(a: MultiPolygon, b: MultiPolygon) -> MultiPolygon:
    """G9 geometry difference (reference ``coastline.py:147``)."""
    return _overlay([a, b], lambda m: m[0] and not m[1])


def union_all(geoms: Sequence[MultiPolygon]) -> MultiPolygon:
    """n-ary union for dissolve — one arrangement pass over all
    operands (cheaper and more robust than a fold of binary unions)."""
    geoms = [g for g in geoms if not is_empty(g)]
    if not geoms:
        return []
    if len(geoms) == 1:
        return make_valid(list(geoms[0]))
    return _overlay(geoms, any)


# ------------------------------------------------------------------ predicates

def _shared_boundary(a: MultiPolygon, b: MultiPolygon) -> bool:
    """Any positive-length collinear edge overlap or vertex contact."""
    ae = list(_edges(a))
    be = list(_edges(b))
    averts = {p for e in ae for p in e}
    bverts = {p for e in be for p in e}
    if averts & bverts:
        return True
    for (p1, p2) in ae:
        for (q1, q2) in be:
            if _segments_touch(p1, p2, q1, q2):
                return True
    return False


def _segments_touch(p1, p2, q1, q2) -> bool:
    """Any point contact between two segments — proper crossing,
    endpoint contact, or collinear overlap (general orientation)."""
    return bool(_seg_points(p1, p2, q1, q2))


def intersects(a: MultiPolygon, b: MultiPolygon) -> bool:
    """G7 complement (NOT ST_Disjoint, reference ``coastline.py:130-134``)."""
    x1, y1, x2, y2 = bbox(a)
    u1, v1, u2, v2 = bbox(b)
    if x2 < u1 or u2 < x1 or y2 < v1 or v2 < y1:
        return False
    if area(intersection(a, b)) > 0:
        return True
    return _shared_boundary(a, b)


def touches(a: MultiPolygon, b: MultiPolygon) -> bool:
    """G6 ``touches`` (reference ``coastline.py:141``): boundaries
    meet, interiors don't. Bbox reject first — the overlay-based
    interior test is the expensive half, and sliver-fix pairing calls
    this across every within-group part pair."""
    if is_empty(a) or is_empty(b):
        return False
    x1, y1, x2, y2 = bbox(a)
    u1, v1, u2, v2 = bbox(b)
    if x2 < u1 or u2 < x1 or y2 < v1 or v2 < y1:
        return False
    if area(intersection(a, b)) > 0:
        return False
    return _shared_boundary(a, b)


def disjoint(a: MultiPolygon, b: MultiPolygon) -> bool:
    return not intersects(a, b)
