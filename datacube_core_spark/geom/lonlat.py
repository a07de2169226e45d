"""Longitude/latitude bounds with antimeridian handling.

Reference semantics (``datacube/utils/geometry/_base.py:1403-1444``):
``lonlat_bounds`` returns a geometry's bbox; in ``safe`` mode, if the
longitude span exceeds 180° the geometry probably wraps the antimeridian
(X-360 for X > 180), so negative longitudes get +360 — but only when that
actually shrinks the span.  Plus the helpers the reference uses around
the dateline: ``clip_lon180`` (snap near-±180 values to a consistent
side) and ``chop_along_antimeridian`` (split a polygon into west/east
parts).  No CRS transform needed here — inputs are already geographic
(our engine's native plane).
"""

from __future__ import annotations

from typing import List

import numpy as np

from .bbox import BoundingBox
from .polygon import MultiPolygon, clip_ring_by_rect, multipolygon_bbox, ring_area


def lonlat_bounds(mp: MultiPolygon, mode: str = "safe") -> BoundingBox:
    """Bounding box of a geographic multipolygon with dateline-wrap fix."""
    assert mode in ("safe", "quick")
    left, bottom, right, top = multipolygon_bbox(mp)
    xx_range = (left, right)

    if mode == "safe" and (right - left) > 180:
        # suspect antimeridian wrap (stored as X-360 for X > 180): undo by
        # adding 360 to negative longitudes, keep only if span shrinks
        xs: List[float] = []
        for poly in mp:
            for ring in poly:
                xs.extend(float(x) for x in np.asarray(ring)[:, 0])
        xx = [x + 360 if x < 0 else x for x in xs]
        cand = (min(xx), max(xx))
        if cand[1] - cand[0] < right - left:
            xx_range = cand

    return BoundingBox.from_xy(xx_range, (bottom, top))


def clip_lon180(x: float, tol: float = 1e-6) -> float:
    """Pin longitudes within tol of ±180 to +180 when negative, matching
    the reference's normalization of dateline-adjacent coordinates."""
    if abs(abs(x) - 180) < tol:
        return 180.0 if x < 0 else x
    return x


def chop_along_antimeridian(mp: MultiPolygon) -> MultiPolygon:
    """Split a polygon expressed in [-180, 360)-extended longitudes into
    a valid multipolygon: the part with lon ≤ 180 plus the part with
    lon ≥ 180 shifted back by 360.

    Input convention (matches ``lonlat_bounds`` safe-mode reasoning): a
    dateline-crossing shape is given with its eastern part at lon > 180.
    """
    out: MultiPolygon = []
    for poly in mp:
        west = [r for r in (clip_ring_by_rect(ring, -180.0, -90.0, 180.0, 90.0) for ring in poly) if len(r) >= 3]
        east = []
        for ring in poly:
            c = clip_ring_by_rect(ring, 180.0, -90.0, 540.0, 90.0)
            if len(c) >= 3 and abs(ring_area(c)) > 0:
                shifted = np.asarray(c, dtype=np.float64).copy()
                shifted[:, 0] -= 360.0
                east.append(shifted)
        if west and abs(ring_area(west[0])) > 0:
            out.append(west)
        if east:
            out.append(east)
    return out
