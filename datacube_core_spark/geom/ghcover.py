"""Geohash region covering — polygon → conservative set of geohash cells.

The string-key sibling of :mod:`.s2cover`: web corpora bucketed by
geohash (the Niemeyer base32 convention, already computed per-point by
:func:`.cellkeys.geohash_col`) can join against a *region* only if the
region side becomes a covering cell set.  Geohash makes this far
simpler than S2 — every cell IS an axis-aligned lon/lat rectangle, so
the exact rect-vs-polygon machinery shared with the S2 coverer
(:func:`.s2cover.rect_parts` / :func:`.s2cover.make_hits` /
``_rect_pokes_outside``) applies directly with no spherical bound
construction.

Hierarchy property the join relies on: a geohash PREFIX is the parent
cell — ancestor-at-precision-p of a point's key is ``substr(key,1,p)``
(string algebra; the S2 analog needs bit tricks).  The covering emits
(key, precision, interior) rows; ``interior`` cells prove membership by
the equi-join alone, boundary cells go to the exact PIP refine —
PipIndex's tier discipline.

Conservativeness: candidate cells enumerate the part bbox EXPANDED by
one cell on each side, and a cell is kept whenever the CLOSED rect
intersects the region (touching counts) — a region point p maps to the
cell containing it, whose rect therefore intersects the region, so p's
cell is always emitted.  Float-edge caveat: the per-point key uses one
``floor`` quantization; a point within ~1 ulp of a cell edge could key
to the neighbor — covered by the one-cell enumeration margin (the
neighbor rect still touches the region wherever the point is inside
it).  Fuzz-tested like the S2 coverer.

Reference analog: the PostGIS GIST candidate pass
(``datacube/drivers/postgis/_spatial.py:62-97``) — here as broadcast
string-prefix equi-joins.
"""

from __future__ import annotations

import math
from typing import List, Tuple

from .cellkeys import GEOHASH_B32
from .polygon import MultiPolygon, polygon_bbox
from .s2cover import _rect_pokes_outside, make_hits, rect_parts

MAX_PRECISION = 8


def _bit_counts(precision: int) -> Tuple[int, int]:
    bits = 5 * precision
    return (bits + 1) // 2, bits // 2  # lon_bits, lat_bits


def cell_sizes(precision: int) -> Tuple[float, float]:
    """(lon_span, lat_span) of one cell at ``precision`` in degrees."""
    lon_bits, lat_bits = _bit_counts(precision)
    return 360.0 / (1 << lon_bits), 180.0 / (1 << lat_bits)


def _spread(x: int) -> int:
    x &= 0xFFFFF
    x = (x | (x << 16)) & 0x0000FFFF0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x << 2)) & 0x3333333333333333
    x = (x | (x << 1)) & 0x5555555555555555
    return x


def cell_key(ix: int, iy: int, precision: int) -> str:
    """Base32 geohash of integer cell coords — the same interleave as
    :func:`.cellkeys.geohash_col` (lon-first from the MSB; bit parity
    picks which operand shifts)."""
    bits = 5 * precision
    if bits % 2 == 0:
        combined = (_spread(ix) << 1) | _spread(iy)
    else:
        combined = _spread(ix) | (_spread(iy) << 1)
    return "".join(
        GEOHASH_B32[(combined >> (bits - 5 * (i + 1))) & 31]
        for i in range(precision)
    )


def py_geohash(lon: float, lat: float, precision: int) -> str:
    """Python twin of :func:`.cellkeys.geohash_col` (same floor/clamp)."""
    lon_bits, lat_bits = _bit_counts(precision)
    ix = int(math.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)))
    iy = int(math.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)))
    ix = min(max(ix, 0), (1 << lon_bits) - 1)
    iy = min(max(iy, 0), (1 << lat_bits) - 1)
    return cell_key(ix, iy, precision)


def pick_precision(mp: MultiPolygon, target_cells_per_axis: int = 8,
                   min_precision: int = 1,
                   max_precision: int = MAX_PRECISION) -> int:
    """Smallest precision whose cell splits the LARGEST part into at
    least ``target_cells_per_axis`` cells per axis (sized per part, not
    per multipolygon bbox — same dateline rationale as
    :func:`.s2cover.pick_covering_level`)."""
    extent = 1e-9
    for poly in mp:
        l, b, r, t = polygon_bbox(poly)
        extent = max(extent, r - l, t - b)
    for p in range(min_precision, max_precision + 1):
        dlon, dlat = cell_sizes(p)
        if max(dlon, dlat) * target_cells_per_axis <= extent:
            return p
    return max_precision


def geohash_covering(mp: MultiPolygon, precision: int | None = None,
                     target_cells_per_axis: int = 8):
    """Conservative covering of ``mp`` at ``precision``.

    Returns ``(keys, interior)`` — parallel lists of base32 strings and
    bools (True = rect strictly inside the region: join rows need no
    refine)."""
    if precision is None:
        precision = pick_precision(mp, target_cells_per_axis)
    lon_bits, lat_bits = _bit_counts(precision)
    dlon, dlat = cell_sizes(precision)
    parts = rect_parts(mp)
    hits = make_hits(parts)

    seen = set()
    keys: List[str] = []
    interior: List[bool] = []
    for _, (pl, pb, pr, pt), _ in parts:
        ix_lo = max(int(math.floor((pl + 180.0) / dlon)) - 1, 0)
        ix_hi = min(int(math.floor((pr + 180.0) / dlon)) + 1, (1 << lon_bits) - 1)
        iy_lo = max(int(math.floor((pb + 90.0) / dlat)) - 1, 0)
        iy_hi = min(int(math.floor((pt + 90.0) / dlat)) + 1, (1 << lat_bits) - 1)
        for ix in range(ix_lo, ix_hi + 1):
            lo = ix * dlon - 180.0
            hi = lo + dlon
            for iy in range(iy_lo, iy_hi + 1):
                if (ix, iy) in seen:
                    continue
                la_lo = iy * dlat - 90.0
                la_hi = la_lo + dlat
                if not hits(lo, la_lo, hi, la_hi):
                    continue
                seen.add((ix, iy))
                keys.append(cell_key(ix, iy, precision))
                interior.append(not _rect_pokes_outside(mp, lo, la_lo, hi, la_hi))
    return keys, interior
