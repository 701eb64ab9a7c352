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

Boolean ops (union/intersection/difference) and the predicates built
on them are EXACT for rectilinear (axis-parallel-edged) polygons via
coordinate compression: overlay both operands on the grid of their
combined x/y coordinates, classify cells by even-odd membership, and
re-trace result rings from the cell grid. Rectilinear covers the
engine's golden fixtures and QA suite; swapping in a full clipping
backend (JTS via Sedona) changes no operator signatures. Degenerate
contact (shared edges — exactly what `touches`/sliver-fix need) is
handled exactly, which float-based general clippers get wrong.
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
    """G1 RepairGeometry-equivalent cleanup for the kernel's domain:
    drop consecutive duplicate vertices, degenerate (<3 pt / zero
    area) rings, and normalize orientation (outer CCW, holes CW).
    (Reference ``bunny.py:221-226``.)"""
    out: MultiPolygon = []
    for outer, holes in mp:
        o = _dedupe(outer)
        if len(o) < 3 or ring_signed_area(o) == 0.0:
            continue
        if ring_signed_area(o) < 0:
            o = list(reversed(o))
        hs = []
        for h in holes:
            hh = _dedupe(h)
            if len(hh) < 3 or ring_signed_area(hh) == 0.0:
                continue
            if ring_signed_area(hh) > 0:
                hh = list(reversed(hh))
            hs.append(hh)
        out.append((o, hs))
    return out


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


# ------------------------------------------------- rectilinear boolean ops

def _edges(mp: MultiPolygon):
    for outer, holes in mp:
        for r in [outer, *holes]:
            n = len(r)
            for i in range(n):
                yield r[i], r[(i + 1) % n]


def _point_in(mp: MultiPolygon, x: float, y: float) -> bool:
    """Even-odd crossing test (point assumed off all edges)."""
    inside = False
    for (x1, y1), (x2, y2) in _edges(mp):
        if (y1 > y) != (y2 > y):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x < xi:
                inside = not inside
    return inside


def _grid(a: MultiPolygon, b: MultiPolygon):
    xs = sorted({p[0] for g in (a, b) for outer, holes in g for r in [outer, *holes] for p in r})
    ys = sorted({p[1] for g in (a, b) for outer, holes in g for r in [outer, *holes] for p in r})
    return xs, ys


def _membership(mp: MultiPolygon, xs: list[float], ys: list[float]) -> list[list[bool]]:
    return [
        [
            bool(mp) and _point_in(mp, (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2)
            for j in range(len(ys) - 1)
        ]
        for i in range(len(xs) - 1)
    ]


def _cells_to_multipolygon(
    cells: list[list[bool]], xs: list[float], ys: list[float]
) -> MultiPolygon:
    """Trace result rings from an in/out cell grid.

    Emits directed boundary edges with interior on the LEFT, stitches
    them into rings (right-turn preference at 4-way vertices keeps
    diagonally-touching regions separate), merges collinear runs, and
    assigns CW rings (holes) to their containing CCW outer."""
    nx, ny = len(xs) - 1, len(ys) - 1

    def inside(i: int, j: int) -> bool:
        return 0 <= i < nx and 0 <= j < ny and cells[i][j]

    edges: dict[tuple[float, float], list[tuple[float, float]]] = {}
    edge_set: set[tuple[tuple[float, float], tuple[float, float]]] = set()

    def emit(p1, p2):
        edges.setdefault(p1, []).append(p2)
        edge_set.add((p1, p2))

    for i in range(nx):
        for j in range(ny):
            if not cells[i][j]:
                continue
            x0, x1 = xs[i], xs[i + 1]
            y0, y1 = ys[j], ys[j + 1]
            if not inside(i, j - 1):
                emit((x0, y0), (x1, y0))  # bottom, left->right
            if not inside(i + 1, j):
                emit((x1, y0), (x1, y1))  # right, up
            if not inside(i, j + 1):
                emit((x1, y1), (x0, y1))  # top, right->left
            if not inside(i - 1, j):
                emit((x0, y1), (x0, y0))  # left, down
    rings: list[list[tuple[float, float]]] = []
    used: set[tuple[tuple[float, float], tuple[float, float]]] = set()
    for start_edge in sorted(edge_set):
        if start_edge in used:
            continue
        ring = [start_edge[0]]
        cur = start_edge
        while True:
            used.add(cur)
            p1, p2 = cur
            ring.append(p2)
            cands = [q for q in edges[p2] if (p2, q) not in used]
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # right-turn preference relative to incoming direction
                dx, dy = p2[0] - p1[0], p2[1] - p1[1]

                def turn(q):
                    qx, qy = q[0] - p2[0], q[1] - p2[1]
                    return dx * qy - dy * qx  # cross: <0 right turn

                nxt = min(cands, key=turn)
            cur = (p2, nxt)
            if cur == start_edge:
                break
        if ring[0] == ring[-1]:
            ring.pop()
        if len(ring) >= 4:
            rings.append(_merge_collinear(ring))

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
        # representative point strictly inside the hole: just right of
        # the first directed edge (which has interior on the left)
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


def _merge_collinear(r: list[tuple[float, float]]) -> list[tuple[float, float]]:
    out: list[tuple[float, float]] = []
    n = len(r)
    for i in range(n):
        prev, cur, nxt = r[i - 1], r[i], r[(i + 1) % n]
        v1 = (cur[0] - prev[0], cur[1] - prev[1])
        v2 = (nxt[0] - cur[0], nxt[1] - cur[1])
        if v1[0] * v2[1] - v1[1] * v2[0] != 0:
            out.append(cur)
    return out


def _boolean(a: MultiPolygon, b: MultiPolygon, op: str) -> MultiPolygon:
    if is_empty(a) and is_empty(b):
        return []
    xs, ys = _grid(a, b)
    if len(xs) < 2 or len(ys) < 2:
        return []
    ma = _membership(a, xs, ys)
    mb = _membership(b, xs, ys)
    nx, ny = len(xs) - 1, len(ys) - 1
    combine = {
        "union": lambda p, q: p or q,
        "intersection": lambda p, q: p and q,
        "difference": lambda p, q: p and not q,
        "symdiff": lambda p, q: p != q,
    }[op]
    cells = [[combine(ma[i][j], mb[i][j]) for j in range(ny)] for i in range(nx)]
    return _cells_to_multipolygon(cells, xs, ys)


def union(a: MultiPolygon, b: MultiPolygon) -> MultiPolygon:
    """G8 geometry union (reference ``coastline.py:145-146``)."""
    return _boolean(a, b, "union")


def intersection(a: MultiPolygon, b: MultiPolygon) -> MultiPolygon:
    return _boolean(a, b, "intersection")


def difference(a: MultiPolygon, b: MultiPolygon) -> MultiPolygon:
    """G9 geometry difference (reference ``coastline.py:147``)."""
    return _boolean(a, b, "difference")


def union_all(geoms: Sequence[MultiPolygon]) -> MultiPolygon:
    """n-ary union for dissolve — one grid pass over all operands
    (cheaper and more robust than a fold of binary unions)."""
    geoms = [g for g in geoms if not is_empty(g)]
    if not geoms:
        return []
    if len(geoms) == 1:
        return make_valid(list(geoms[0]))
    xs = sorted({p[0] for g in geoms for outer, holes in g for r in [outer, *holes] for p in r})
    ys = sorted({p[1] for g in geoms for outer, holes in g for r in [outer, *holes] for p in r})
    if len(xs) < 2 or len(ys) < 2:
        return []
    nx, ny = len(xs) - 1, len(ys) - 1
    cells = [[False] * ny for _ in range(nx)]
    for g in geoms:
        m = _membership(g, xs, ys)
        for i in range(nx):
            row = cells[i]
            mi = m[i]
            for j in range(ny):
                row[j] = row[j] or mi[j]
    return _cells_to_multipolygon(cells, xs, ys)


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
    """Axis-parallel segment contact: collinear overlap or endpoint-on-
    segment (sufficient for the rectilinear domain)."""
    def on_seg(p, a, b):
        if a[0] == b[0]:  # vertical
            return p[0] == a[0] and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
        if a[1] == b[1]:  # horizontal
            return p[1] == a[1] and min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        return False

    return on_seg(q1, p1, p2) or on_seg(q2, p1, p2) or on_seg(p1, q1, q2) or on_seg(p2, q1, q2)


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
    meet, interiors don't."""
    if area(intersection(a, b)) > 0:
        return False
    return _shared_boundary(a, b)


def disjoint(a: MultiPolygon, b: MultiPolygon) -> bool:
    return not intersects(a, b)
