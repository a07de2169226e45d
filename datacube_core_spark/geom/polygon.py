"""Pure-numpy polygon kernels (no shapely available in this environment).

These implement exactly the geometric predicates the engine needs, with
the reference's edge semantics:

* ``interiors_intersect`` reproduces the reference rule
  ``intersects(a, b) = a.intersects(b) and not a.touches(b)``
  (reference ``datacube/utils/geometry/_base.py:1302-1305``): two areal
  geometries "intersect" only when their *interiors* overlap — polygons
  sharing only an edge or corner do NOT match.
* ``points_strictly_inside`` is the point version: a point on the boundary
  touches, so it is NOT inside.

Everything is vectorized numpy so it can run inside Arrow/pandas UDFs over
large batches (per ``BASELINE.json.input_hint``: no per-row Python).

A polygon is represented as a list of rings; ring 0 is the outer shell,
remaining rings are holes.  Each ring is an ``(N, 2)`` float64 array of
``(x, y)`` vertices; closing vertex optional (handled either way).
A multipolygon is a list of polygons.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

Ring = np.ndarray  # (N, 2) float64
Polygon = List[Ring]  # [outer, hole, hole, ...]
MultiPolygon = List[Polygon]


def as_ring(coords) -> Ring:
    """Normalize a coordinate sequence to an open (N,2) float64 ring."""
    a = np.asarray(coords, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] != 2:
        raise ValueError(f"ring must be (N,2), got {a.shape}")
    if len(a) >= 2 and np.array_equal(a[0], a[-1]):
        a = a[:-1]
    return a


def ring_area(ring: Ring) -> float:
    """Signed shoelace area (CCW positive)."""
    r = as_ring(ring)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return 0.5 * float(np.sum(x * y2 - x2 * y))


def polygon_area(poly: Polygon) -> float:
    """Net unsigned area: |outer| - sum(|holes|)."""
    if not poly:
        return 0.0
    area = abs(ring_area(poly[0]))
    for hole in poly[1:]:
        area -= abs(ring_area(hole))
    return area


def ring_bbox(ring: Ring) -> Tuple[float, float, float, float]:
    r = as_ring(ring)
    return (
        float(r[:, 0].min()),
        float(r[:, 1].min()),
        float(r[:, 0].max()),
        float(r[:, 1].max()),
    )


def polygon_bbox(poly: Polygon) -> Tuple[float, float, float, float]:
    return ring_bbox(poly[0])


def multipolygon_bbox(mp: MultiPolygon) -> Tuple[float, float, float, float]:
    boxes = [polygon_bbox(p) for p in mp]
    return (
        min(b[0] for b in boxes),
        min(b[1] for b in boxes),
        max(b[2] for b in boxes),
        max(b[3] for b in boxes),
    )


# ---------------------------------------------------------------------------
# Sutherland–Hodgman clip of an arbitrary (possibly concave) ring by an
# axis-aligned rectangle.  Clipping a concave subject against a convex clip
# window is exact for area purposes (degenerate zero-area bridges may appear
# but contribute zero to the shoelace sum).
# ---------------------------------------------------------------------------

def _clip_halfplane(ring: np.ndarray, axis: int, bound: float, keep_less: bool) -> np.ndarray:
    """Clip ring against one half-plane: coord[axis] <= bound (keep_less)
    or coord[axis] >= bound."""
    n = len(ring)
    if n == 0:
        return ring
    vals = ring[:, axis]
    inside = vals <= bound if keep_less else vals >= bound
    if inside.all():
        return ring
    out = []
    for i in range(n):
        j = (i + 1) % n
        ci, cj = inside[i], inside[j]
        pi, pj = ring[i], ring[j]
        if ci:
            out.append(pi)
        if ci != cj:
            # edge crosses the boundary — emit intersection point
            t = (bound - pi[axis]) / (pj[axis] - pi[axis])
            out.append(pi + t * (pj - pi))
    if not out:
        return np.empty((0, 2), dtype=np.float64)
    return np.asarray(out, dtype=np.float64)


def clip_ring_by_rect(ring: Ring, left: float, bottom: float, right: float, top: float) -> np.ndarray:
    r = as_ring(ring)
    r = _clip_halfplane(r, 0, right, True)
    r = _clip_halfplane(r, 0, left, False)
    r = _clip_halfplane(r, 1, top, True)
    r = _clip_halfplane(r, 1, bottom, False)
    return r


def clipped_area(poly: Polygon, left: float, bottom: float, right: float, top: float) -> float:
    """Net area of polygon ∩ rectangle."""
    if not poly:
        return 0.0
    area = abs(ring_area(clip_ring_by_rect(poly[0], left, bottom, right, top)))
    for hole in poly[1:]:
        area -= abs(ring_area(clip_ring_by_rect(hole, left, bottom, right, top)))
    return area


def rect_interiors_intersect(poly: Polygon, left: float, bottom: float, right: float, top: float) -> bool:
    """True iff interior(poly) ∩ interior(rect) is non-empty — equivalent to
    ``intersects ∧ ¬touches`` for areal geometries (edge-only contact has
    zero intersection area)."""
    # cheap bbox reject first
    bl, bb_, br, bt = polygon_bbox(poly)
    if bl >= right or br <= left or bb_ >= top or bt <= bottom:
        return False
    return clipped_area(poly, left, bottom, right, top) > 0.0


def multipolygon_rect_interiors_intersect(mp: MultiPolygon, left, bottom, right, top) -> bool:
    return any(rect_interiors_intersect(p, left, bottom, right, top) for p in mp)


def rect_closed_intersects(poly: Polygon, left: float, bottom: float, right: float, top: float) -> bool:
    """Shapely-style CLOSED ``intersects`` of polygon vs rectangle: shared
    boundary points count (used where the reference calls plain
    ``.intersects`` without the ¬touches refinement, e.g. GeoboxTiles).

    net clipped area > 0 → interiors overlap; else the polygon touches the
    rect iff any ring passes through the closed rect (its clip against the
    rect is non-empty, possibly degenerate)."""
    bl, bb_, br, bt = polygon_bbox(poly)
    if bl > right or br < left or bb_ > top or bt < bottom:
        return False
    if clipped_area(poly, left, bottom, right, top) > 0.0:
        return True
    for ring in poly:
        if len(clip_ring_by_rect(ring, left, bottom, right, top)) > 0:
            return True
    return False


def multipolygon_rect_closed_intersects(mp: MultiPolygon, left, bottom, right, top) -> bool:
    return any(rect_closed_intersects(p, left, bottom, right, top) for p in mp)


# ---------------------------------------------------------------------------
# Vectorized point-in-polygon: strict interior (boundary = touches = False),
# even-odd rule over all rings (outer + holes handled uniformly).
# ---------------------------------------------------------------------------

def _points_on_ring_boundary(xs: np.ndarray, ys: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean mask: point lies exactly on a ring segment."""
    on = np.zeros(len(xs), dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        # collinear: cross product == 0, and within segment bbox
        cross = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
        lo_x, hi_x = (x1, x2) if x1 <= x2 else (x2, x1)
        lo_y, hi_y = (y1, y2) if y1 <= y2 else (y2, y1)
        on |= (cross == 0.0) & (xs >= lo_x) & (xs <= hi_x) & (ys >= lo_y) & (ys <= hi_y)
    return on


def _crossings(xs: np.ndarray, ys: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing count parity for a batch of points vs one ring.

    Uses the standard half-open rule (y1 <= y < y2 per edge) so vertices
    are counted exactly once; boundary points are resolved separately.
    """
    inside = np.zeros(len(xs), dtype=bool)
    n = len(ring)
    x1s, y1s = ring[:, 0], ring[:, 1]
    x2s, y2s = np.roll(x1s, -1), np.roll(y1s, -1)
    for i in range(n):
        x1, y1, x2, y2 = x1s[i], y1s[i], x2s[i], y2s[i]
        if y1 == y2:
            continue
        cond = (ys >= min(y1, y2)) & (ys < max(y1, y2))
        if not cond.any():
            continue
        x_at = x1 + (ys - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cond & (xs < x_at)
    return inside


def points_strictly_inside(xs, ys, poly: Polygon) -> np.ndarray:
    """Vectorized strict-interior PIP over all rings (even-odd)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    inside = np.zeros(len(xs), dtype=bool)
    boundary = np.zeros(len(xs), dtype=bool)
    for raw in poly:
        ring = as_ring(raw)
        if len(ring) < 3:
            continue
        inside ^= _crossings(xs, ys, ring)
        boundary |= _points_on_ring_boundary(xs, ys, ring)
    return inside & ~boundary


def points_strictly_inside_multi(xs, ys, mp: MultiPolygon) -> np.ndarray:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    out = np.zeros(len(xs), dtype=bool)
    for poly in mp:
        out |= points_strictly_inside(xs, ys, poly)
    return out


# ---------------------------------------------------------------------------
# General polygon × polygon interior intersection (tiles are rectangles so
# the rect path above is the hot path; this generic test covers
# region-extent overlap checks).
# ---------------------------------------------------------------------------

def _segments_properly_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """Any pair of edges (one from each ring) properly crossing?"""

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    na, nb = len(a), len(b)
    for i in range(na):
        p1, p2 = a[i], a[(i + 1) % na]
        d1 = orient(p1[0], p1[1], p2[0], p2[1], b[:, 0], b[:, 1])
        d1n = np.roll(d1, -1)
        for j in range(nb):
            q1, q2 = b[j], b[(j + 1) % nb]
            o1, o2 = d1[j], d1n[j]
            o3 = orient(q1[0], q1[1], q2[0], q2[1], p1[0], p1[1])
            o4 = orient(q1[0], q1[1], q2[0], q2[1], p2[0], p2[1])
            if ((o1 > 0) != (o2 > 0)) and ((o3 > 0) != (o4 > 0)) and o1 != 0 and o2 != 0 and o3 != 0 and o4 != 0:
                return True
    return False


def interiors_intersect(pa: Polygon, pb: Polygon) -> bool:
    """True iff interiors of two simple polygons overlap (reference
    ``intersects ∧ ¬touches`` semantics)."""
    al, ab_, ar, at = polygon_bbox(pa)
    bl, bb_, br, bt = polygon_bbox(pb)
    if al >= br or ar <= bl or ab_ >= bt or at <= bb_:
        return False
    ra, rb = as_ring(pa[0]), as_ring(pb[0])
    # vertex of one strictly inside the other
    if points_strictly_inside(ra[:, 0], ra[:, 1], pb).any():
        return True
    if points_strictly_inside(rb[:, 0], rb[:, 1], pa).any():
        return True
    # proper edge crossing implies interior overlap
    if _segments_properly_cross(ra, rb):
        return True
    # centroid-sample fallback for identical/edge-aligned shapes
    cx, cy = ra[:, 0].mean(), ra[:, 1].mean()
    if points_strictly_inside(np.array([cx]), np.array([cy]), pa)[0] and points_strictly_inside(
        np.array([cx]), np.array([cy]), pb
    )[0]:
        return True
    return False


def box_ring(left: float, bottom: float, right: float, top: float) -> Ring:
    """Rectangle as a CCW ring."""
    return np.array(
        [[left, bottom], [right, bottom], [right, top], [left, top]], dtype=np.float64
    )


# ---------------------------------------------------------------------------
# Compact serialization for shipping polygons through DataFrames / broadcast
# (WKB-like but minimal; avoids needing shapely at either end).
# rings encoded as list< list< struct<x,y> > > columns instead would also
# work — this keeps a single binary column like the WKB plan in SURVEY §1.1.
# ---------------------------------------------------------------------------

def pack_multipolygon(mp: MultiPolygon) -> bytes:
    import struct

    parts = [struct.pack("<I", len(mp))]
    for poly in mp:
        parts.append(struct.pack("<I", len(poly)))
        for raw in poly:
            ring = as_ring(raw)
            parts.append(struct.pack("<I", len(ring)))
            parts.append(ring.astype("<f8").tobytes())
    return b"".join(parts)


def unpack_multipolygon(buf: bytes) -> MultiPolygon:
    import struct

    off = 0

    def read_u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", buf, off)
        off += 4
        return v

    mp: MultiPolygon = []
    n_poly = read_u32()
    for _ in range(n_poly):
        poly: Polygon = []
        n_rings = read_u32()
        for _ in range(n_rings):
            n_pts = read_u32()
            ring = np.frombuffer(buf, dtype="<f8", count=n_pts * 2, offset=off).reshape(n_pts, 2)
            off += n_pts * 16
            poly.append(ring.copy())
        mp.append(poly)
    return mp
