"""Constructive geometry operations (reference §2.8 surface, pure numpy).

The reference delegates these to shapely (``datacube/utils/geometry/
_base.py:481-660``); shapely is absent here, so the subset the engine
needs is implemented directly:

* area / length / centroid (area-weighted, holes subtract)
* envelope (bbox ring), boundary (the rings)
* convex_hull (Andrew monotone chain)
* simplify (Douglas–Peucker, ``tol`` in coordinate units)
* buffer for axis-rectangles (exact), convex polygons (edge offset +
  miter; matches shapely's JOIN_STYLE.mitre for convex inputs), and
  CONCAVE polygons (Minkowski-sum decomposition — edge bands + vertex
  discs — resolved by the exact union in ``geom.boolean``; round joins,
  shapely's quad_segs disc approximation).
* segmented / densify — max-segment-length vertex insertion (reference
  ``segmented``/``densify`` at ``_base.py:627-648,422-444``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .bbox import BoundingBox
from .polygon import MultiPolygon, Polygon, Ring, as_ring, box_ring, polygon_bbox, ring_area


def _ring_area_centroid(raw: Ring) -> Tuple[float, float, float]:
    """(unsigned area, cx, cy) of one ring via shoelace moments."""
    r = as_ring(raw)
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y2 - x2 * y
    a_signed = 0.5 * float(cross.sum())
    if a_signed == 0.0:
        return 0.0, float(x.mean()), float(y.mean())
    cx = float(((x + x2) * cross).sum()) / (6.0 * a_signed)
    cy = float(((y + y2) * cross).sum()) / (6.0 * a_signed)
    return abs(a_signed), cx, cy


def polygon_centroid(poly: Polygon) -> Tuple[float, float]:
    """Area-weighted centroid; holes subtract (ring 0 = outer)."""
    sa = sx = sy = 0.0
    for idx, raw in enumerate(poly):
        a, cx, cy = _ring_area_centroid(raw)
        w = a if idx == 0 else -a
        sa += w
        sx += w * cx
        sy += w * cy
    if sa == 0:
        r = as_ring(poly[0])
        return float(r[:, 0].mean()), float(r[:, 1].mean())
    return sx / sa, sy / sa


def ring_length(ring: Ring) -> float:
    r = as_ring(ring)
    d = np.roll(r, -1, axis=0) - r
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def polygon_length(poly: Polygon) -> float:
    """Total boundary length (outer + holes)."""
    return sum(ring_length(r) for r in poly)


def envelope(poly: Polygon) -> Ring:
    l, b, r, t = polygon_bbox(poly)
    return box_ring(l, b, r, t)


def convex_hull(points) -> Ring:
    """Andrew monotone chain; returns CCW hull ring."""
    pts = np.unique(np.asarray(points, dtype=np.float64).reshape(-1, 2), axis=0)
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: List = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: List = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def simplify_ring(ring: Ring, tol: float) -> Ring:
    """Douglas–Peucker on a closed ring (split at the two extremes)."""
    r = as_ring(ring)
    if len(r) <= 4:
        return r

    def dp(pts: np.ndarray) -> np.ndarray:
        if len(pts) <= 2:
            return pts
        a, b = pts[0], pts[-1]
        ab = b - a
        denom = np.hypot(*ab) or 1.0
        d = np.abs(np.cross(ab, pts[1:-1] - a)) / denom
        i = int(np.argmax(d))
        if d[i] <= tol:
            return np.array([a, b])
        left = dp(pts[: i + 2])
        right = dp(pts[i + 1 :])
        return np.concatenate([left[:-1], right])

    # a closed ring has no natural endpoints: anchor at vertex 0 and the
    # vertex farthest from it, simplify the two open halves independently
    d0 = np.hypot(r[:, 0] - r[0, 0], r[:, 1] - r[0, 1])
    i1 = int(np.argmax(d0))
    if i1 == 0:
        return r
    first = dp(r[: i1 + 1])
    second = dp(np.vstack([r[i1:], r[:1]]))
    out = np.concatenate([first[:-1], second[:-1]])
    return out if len(out) >= 3 else r


def interpolate_line(line, distance: float) -> Tuple[float, float]:
    """Point ``distance`` units along a polyline — reference
    ``Geometry.interpolate`` (``_base.py:650``, shapely/GEOS
    LengthIndexedLine semantics): a NEGATIVE distance is measured
    backwards from the END of the line; out-of-range distances clamp to
    the nearest endpoint."""
    pts = np.asarray(line, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[1] != 2 or len(pts) == 0:
        raise TypeError("interpolate needs a (N, 2) polyline")
    if distance < 0:
        total = float(np.hypot(*(np.diff(pts, axis=0).T)).sum()) if len(pts) > 1 else 0.0
        distance = max(0.0, total + distance)
    if len(pts) == 1 or distance <= 0:
        return float(pts[0, 0]), float(pts[0, 1])
    remaining = float(distance)
    for a, b in zip(pts[:-1], pts[1:]):
        seg = float(np.hypot(*(b - a)))
        if remaining <= seg and seg > 0:
            t = remaining / seg
            p = a + (b - a) * t
            return float(p[0]), float(p[1])
        remaining -= seg
    return float(pts[-1, 0]), float(pts[-1, 1])


def _segments_properly_intersect(p1, p2, p3, p4) -> bool:
    """True if open segments (p1,p2) and (p3,p4) cross (shared endpoints
    between ADJACENT ring edges are handled by the caller)."""
    d1 = np.cross(p4 - p3, p1 - p3)
    d2 = np.cross(p4 - p3, p2 - p3)
    d3 = np.cross(p2 - p1, p3 - p1)
    d4 = np.cross(p2 - p1, p4 - p1)
    return bool(((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)))


def _on_segment(a, b, c) -> bool:
    """c (already known collinear with a-b) lies within a-b's bbox."""
    return bool(
        min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
    )


def _segments_touch(p1, p2, p3, p4) -> bool:
    """ANY contact between the two segments: proper crossing, vertex on
    the other segment's interior or endpoint, or collinear overlap."""
    d1 = np.cross(p4 - p3, p1 - p3)
    d2 = np.cross(p4 - p3, p2 - p3)
    d3 = np.cross(p2 - p1, p3 - p1)
    d4 = np.cross(p2 - p1, p4 - p1)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    if d1 == 0 and _on_segment(p3, p4, p1):
        return True
    if d2 == 0 and _on_segment(p3, p4, p2):
        return True
    if d3 == 0 and _on_segment(p1, p2, p3):
        return True
    if d4 == 0 and _on_segment(p1, p2, p4):
        return True
    return False


def ring_is_simple(ring: Ring) -> bool:
    """Shapely-strength simplicity: no two NON-ADJACENT edges make ANY
    contact (proper crossing, vertex-on-edge touch, collinear overlap —
    grid-aligned DP output pinches exactly this way), and no consecutive
    edge pair doubles back on itself (spike).  O(n²) — driver-side util
    sizes."""
    r = as_ring(ring)
    n = len(r)
    if n < 3:
        return False
    edges = [(r[i], r[(i + 1) % n]) for i in range(n)]
    for i in range(n):
        a, b = edges[i]
        c = edges[(i + 1) % n][1]
        # spike: consecutive edges collinear AND reversing direction
        if np.cross(b - a, c - b) == 0 and np.dot(b - a, c - b) < 0:
            return False
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent around the wrap
            if _segments_touch(a, b, edges[j][0], edges[j][1]):
                return False
    return True


def rings_touch(r1: Ring, r2: Ring) -> bool:
    """ANY edge contact between two rings (for shell/hole validation)."""
    a = as_ring(r1)
    b = as_ring(r2)
    ea = [(a[i], a[(i + 1) % len(a)]) for i in range(len(a))]
    eb = [(b[i], b[(i + 1) % len(b)]) for i in range(len(b))]
    for s1, s2 in ea:
        for s3, s4 in eb:
            if _segments_touch(s1, s2, s3, s4):
                return True
    return False


def simplify_ring_preserve_topology(ring: Ring, tol: float) -> Ring:
    """Topology-preserving Douglas–Peucker (reference ``Geometry.simplify``
    with ``preserve_topology=True``, ``_base.py:660`` — GEOS
    TopologyPreservingSimplifier semantics: the output is never invalid).

    Strategy: plain DP at ``tol``; if the result ring self-intersects or
    collapses (< 3 vertices / zero area), halve the tolerance and retry —
    converging to the original ring, which is simple by assumption."""
    r = as_ring(ring)
    t = float(tol)
    for _ in range(20):
        s = simplify_ring(r, t)
        if len(s) >= 3 and abs(ring_area(s)) > 0 and ring_is_simple(s):
            return s
        t /= 2.0
    return r


def _polygon_rings_valid(rings) -> bool:
    """Inter-ring validity: every hole stays strictly inside the shell
    and no two rings touch (per-ring simplicity is checked separately)."""
    from .polygon import points_strictly_inside

    shell = rings[0]
    for i, hole in enumerate(rings[1:], start=1):
        h = as_ring(hole)
        if not points_strictly_inside(h[:, 0], h[:, 1], [shell]).all():
            return False
        if rings_touch(shell, hole):
            return False
        for other in rings[i + 1:]:
            if rings_touch(hole, other):
                return False
    return True


def simplify_multipolygon(mp: MultiPolygon, tol: float, preserve_topology: bool = True) -> MultiPolygon:
    """Per-ring simplify over a multipolygon; with ``preserve_topology``
    every output ring is simple and non-degenerate AND the rings of each
    polygon stay mutually valid (holes inside the shell, no ring-ring
    contact) — simplifying shell and holes independently can otherwise
    straighten a concave shell ACROSS a hole (GEOS
    TopologyPreservingSimplifier prevents exactly this).  On violation
    the whole polygon retries at halved tolerance, converging to the
    original rings."""
    if not preserve_topology:
        out_simple: MultiPolygon = []
        for poly in mp:
            rings = [simplify_ring(ring, tol) for ring in poly]
            rings = [r for r in rings if len(r) >= 3 and abs(ring_area(r)) > 0]
            if rings:
                out_simple.append(rings)
        return out_simple

    out: MultiPolygon = []
    for poly in mp:
        t = float(tol)
        chosen = None
        for _ in range(20):
            rings = [simplify_ring_preserve_topology(ring, t) for ring in poly]
            rings = [r for r in rings if len(r) >= 3 and abs(ring_area(r)) > 0]
            if rings and (len(rings) < 2 or _polygon_rings_valid(rings)):
                chosen = rings
                break
            t /= 2.0
        if chosen is None:
            chosen = [as_ring(r) for r in poly]  # give up: original polygon
        out.append(chosen)
    return out


def is_convex(ring: Ring) -> bool:
    r = as_ring(ring)
    n = len(r)
    sign = 0
    for i in range(n):
        o, a, b = r[i], r[(i + 1) % n], r[(i + 2) % n]
        c = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
        if c != 0:
            s = 1 if c > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


def buffer_polygon(poly: Polygon, dist: float) -> Polygon:
    """Outward buffer: exact for axis-rects; miter edge-offset for convex
    rings; concave input routes through the Minkowski-union path (round
    joins); input WITH holes routes through the exact boolean path
    (:func:`buffer_polygon_with_holes`)."""
    if len(poly) > 1:
        out = buffer_polygon_with_holes(poly, dist)
        if len(out) != 1:
            raise ValueError("holes buffer produced a multipolygon (disjoint input?)")
        return out[0]
    ring = as_ring(poly[0])
    # axis-rect fast path
    xs, ys = np.unique(ring[:, 0]), np.unique(ring[:, 1])
    if len(ring) == 4 and len(xs) == 2 and len(ys) == 2:
        return [box_ring(xs[0] - dist, ys[0] - dist, xs[1] + dist, ys[1] + dist)]
    if not is_convex(ring):
        # concave path: Minkowski-sum decomposition resolved by the exact
        # union machinery (see buffer_polygon_concave)
        out = buffer_polygon_concave(poly, dist)
        if len(out) != 1:
            raise ValueError("concave buffer produced a multipolygon (disjoint input?)")
        return out[0]
    # ensure CCW
    if ring_area(ring) < 0:
        ring = ring[::-1]
    n = len(ring)
    out = []
    for i in range(n):
        p_prev, p, p_next = ring[i - 1], ring[i], ring[(i + 1) % n]
        # outward normals of adjacent edges (CCW ring -> outward = right of direction... for CCW, outward normal is (dy, -dx))
        d1 = p - p_prev
        d2 = p_next - p
        n1 = np.array([d1[1], -d1[0]]) / (np.hypot(*d1) or 1.0)
        n2 = np.array([d2[1], -d2[0]]) / (np.hypot(*d2) or 1.0)
        bis = n1 + n2
        norm = np.hypot(*bis)
        if norm < 1e-12:
            out.append(p + n1 * dist)
            continue
        bis /= norm
        # miter length so both edges are offset exactly by dist
        cos_half = float(np.clip(np.dot(bis, n1), 1e-6, 1.0))
        out.append(p + bis * (dist / cos_half))
    return [np.asarray(out, dtype=np.float64)]


def segmented(ring: Ring, max_len: float) -> Ring:
    """Insert vertices so no segment exceeds ``max_len``."""
    r = as_ring(ring)
    out = []
    n = len(r)
    for i in range(n):
        a, b = r[i], r[(i + 1) % n]
        out.append(a)
        seg = np.hypot(*(b - a))
        if seg > max_len:
            k = int(np.ceil(seg / max_len))
            for j in range(1, k):
                out.append(a + (b - a) * (j / k))
    return np.asarray(out, dtype=np.float64)


def to_crs_multipolygon(
    mp: MultiPolygon,
    src_crs: str,
    dst_crs: str,
    resolution: Optional[float] = None,
    wrapdateline: bool = False,
) -> MultiPolygon:
    """Project a multipolygon to another CRS with auto-segmentize —
    reference ``Geometry.to_crs`` (``_base.py:679-715``).

    ``resolution`` defaults to the reference's rule: 1 (degree) for a
    geographic source, 100_000 (metres) for a projected one; pass
    ``float('inf')`` to disable densification.  ``wrapdateline=True`` on
    a projection INTO a geographic CRS chops the result along the
    antimeridian and clips longitudes to [-180, 180] (reference
    ``:707-712``; here via the already-ported ``lonlat`` helpers).
    """
    import math as _math

    from .lonlat import chop_along_antimeridian, clip_lon180
    from .mercator import get_transformer, _norm_crs, EPSG_4326

    s, d = _norm_crs(src_crs), _norm_crs(dst_crs)
    if s == d:
        return mp
    fwd = get_transformer(s, d)
    if resolution is None:
        resolution = 1.0 if s == EPSG_4326 else 100_000.0

    out: MultiPolygon = []
    for poly in mp:
        new_poly = []
        for ring in poly:
            r = as_ring(ring)
            if _math.isfinite(resolution):
                r = segmented(r, resolution)
            xs, ys = fwd(r[:, 0], r[:, 1])
            new_poly.append(np.stack([xs, ys], axis=1))
        out.append(new_poly)

    if wrapdateline and d == EPSG_4326:
        # unwrap is only needed when the projected shape crossed the
        # dateline; chop splits extended-longitude parts, clip snaps
        # near-±180 vertices
        out = chop_along_antimeridian(out)
        out = [
            [np.stack([np.array([clip_lon180(float(x)) for x in ring[:, 0]]), ring[:, 1]], axis=1) for ring in poly]
            for poly in out
        ]
    return out


def _disc_ring(cx: float, cy: float, r: float, segs: int = 32) -> Ring:
    ang = np.linspace(0.0, 2.0 * np.pi, segs, endpoint=False)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


def _ring_band_parts(ring: Ring, dist: float, quad_segs: int) -> List[MultiPolygon]:
    """Minkowski pieces of the d-band around a ring's boundary: one
    2d-wide rectangle per edge + one circumscribed polygonal disc per
    vertex (round joins).  Shared by the outward buffer (band ∪ polygon)
    and hole erosion (hole ∖ band)."""
    segs = 4 * quad_segs
    # circumscribed radius so the polygonal disc CONTAINS the true disc
    r_circ = dist / np.cos(np.pi / segs)
    parts: List[MultiPolygon] = []
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        d = b - a
        ln = float(np.hypot(*d))
        if ln == 0.0:
            continue
        nx, ny = d[1] / ln * dist, -d[0] / ln * dist  # right normal
        quad = np.array(
            [
                [a[0] + nx, a[1] + ny], [b[0] + nx, b[1] + ny],
                [b[0] - nx, b[1] - ny], [a[0] - nx, a[1] - ny],
            ]
        )
        parts.append([[quad]])
        parts.append([[_disc_ring(float(a[0]), float(a[1]), r_circ, segs)]])
    return parts


def buffer_polygon_concave(poly: Polygon, dist: float, quad_segs: int = 8) -> MultiPolygon:
    """Outward buffer of an arbitrary (possibly concave) simple polygon via
    the Minkowski-sum decomposition: buffer(P, d) = P ∪ (one d-wide
    rectangle per edge) ∪ (one d-radius disc per vertex), resolved with
    the exact union (``geom.boolean.unary_union``).

    Discs are regular ``4·quad_segs``-gons (shapely's quad_segs
    convention — the reference's shapely ``buffer`` at ``_base.py:657``
    uses the same polygonal approximation), circumscribed so the
    approximation error is outward-only never inward.  Round joins.
    Polygons WITH holes route through :func:`buffer_polygon_with_holes`.
    """
    from .boolean import unary_union

    if dist < 0:
        return buffer_polygon_negative(poly, dist, quad_segs)
    if dist == 0:
        # shapely's buffer(0) is the identity on valid polygons
        return [[as_ring(r) for r in poly]]
    if len(poly) > 1:
        return buffer_polygon_with_holes(poly, dist, quad_segs)
    ring = as_ring(poly[0])
    parts: List[MultiPolygon] = [[[ring]]]
    parts.extend(_ring_band_parts(ring, dist, quad_segs))
    return unary_union(parts)


def buffer_polygon_negative(poly: Polygon, dist: float, quad_segs: int = 8) -> MultiPolygon:
    """EROSION (negative buffer) of a polygon, shapely semantics:

        erode(P, d) = P ∖ band(∂P, d)      (shell shrinks inward)

    with every hole DILATED by d (hole ∪ band(∂hole, d)) and subtracted.
    A polygon narrower than 2·d erodes to nothing (empty MultiPolygon) —
    exactly shapely's ``buffer(-d)``.  Corner rounding is inward-only
    (circumscribed discs make the band a superset of the true band, so
    the eroded region is a subset of the true erosion — conservative)."""
    from .boolean import difference, unary_union

    d = abs(float(dist))
    if d == 0:
        return [[as_ring(r) for r in poly]]
    shell = as_ring(poly[0])
    band = unary_union(_ring_band_parts(shell, d, quad_segs))
    eroded = difference([[shell]], band)
    if not eroded:
        return []
    grown_holes: List[MultiPolygon] = []
    for hole in poly[1:]:
        hring = as_ring(hole)
        hb = unary_union([[[hring]]] + _ring_band_parts(hring, d, quad_segs))
        grown_holes.append(hb)
    if grown_holes:
        eroded = difference(eroded, unary_union(grown_holes))
    return eroded


def buffer_polygon_with_holes(poly: Polygon, dist: float, quad_segs: int = 8) -> MultiPolygon:
    """Outward buffer of a polygon with holes — closes reference
    ``_base.py:657`` (shapely handles any geometry) fully:

        buffer(P, d) = buffer(shell, d) ∖ ⋃ᵢ erode(holeᵢ, d)
        erode(hole, d) = hole ∖ band(∂hole, d)

    where ``band`` is the same Minkowski edge-rect + vertex-disc pieces
    the concave buffer uses, resolved by the exact boolean kernel.  A
    hole narrower than 2·dist erodes to nothing and disappears from the
    result — exactly shapely's behavior.  Returns a MultiPolygon (the
    result can keep holes, shrunk by dist).
    """
    from .boolean import difference, unary_union

    if dist < 0:
        return buffer_polygon_negative(poly, dist, quad_segs)
    if dist == 0:
        return [[as_ring(r) for r in poly]]
    shell_buf = buffer_polygon_concave([poly[0]], dist, quad_segs)
    eroded: List[MultiPolygon] = []
    for hole in poly[1:]:
        hring = as_ring(hole)
        band = unary_union(_ring_band_parts(hring, dist, quad_segs))
        er = difference([[hring]], band)
        if er:
            eroded.append(er)
    if not eroded:
        return shell_buf
    return difference(shell_buf, unary_union(eroded))
