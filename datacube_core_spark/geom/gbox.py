"""GeoBox operations + GeoboxTiles (secondary, pixel-level chunking).

Reference semantics (``datacube/utils/geometry/gbox.py``): flipy/flipx/
translate_pix/pad/pad_wh/zoom_out/zoom_to as affine compositions;
``GeoboxTiles`` partitions a GeoBox into pixel chunks with
``range_from_bbox`` (clamped floor/ceil chunk-index ranges through the
inverse affine — the chunk-join candidate enumeration of SURVEY §2.3)
and ``tiles`` (exact extent-intersect refine).

In the Spark engine this is the secondary partitioning *inside* a grid
cell: candidate chunk indices are computed arithmetically per row and the
exact refine happens only for geometry-valued inputs.
"""

from __future__ import annotations

import itertools
import math
from typing import Dict, Iterable, Optional, Tuple

from .affine import Affine
from .bbox import BoundingBox
from .grid import GeoBox
from .mathx import align_up, clamp, roi_normalise, roi_shape
from .polygon import (
    MultiPolygon,
    multipolygon_bbox,
    multipolygon_rect_closed_intersects,
)


def gbox_getitem(gbox: GeoBox, roi) -> GeoBox:
    """Sub-geobox by (row-slice, col-slice) ROI."""
    roi = roi_normalise(roi, gbox.shape)
    ty, tx = (s.start for s in roi)
    h, w = roi_shape(roi)
    affine = gbox.affine * Affine.translation(tx, ty)
    return GeoBox(w, h, affine, gbox.crs)


def flipy(gbox: GeoBox) -> GeoBox:
    h, w = gbox.shape
    a = gbox.affine * (Affine.translation(0, h) * Affine.scale(1, -1))
    return GeoBox(w, h, a, gbox.crs)


def flipx(gbox: GeoBox) -> GeoBox:
    h, w = gbox.shape
    a = gbox.affine * (Affine.translation(w, 0) * Affine.scale(-1, 1))
    return GeoBox(w, h, a, gbox.crs)


def translate_pix(gbox: GeoBox, tx: float, ty: float) -> GeoBox:
    h, w = gbox.shape
    return GeoBox(w, h, gbox.affine * Affine.translation(tx, ty), gbox.crs)


def pad(gbox: GeoBox, padx: int, pady: Optional[int] = None) -> GeoBox:
    pady = padx if pady is None else pady
    h, w = gbox.shape
    a = gbox.affine * Affine.translation(-padx, -pady)
    return GeoBox(w + padx * 2, h + pady * 2, a, gbox.crs)


def pad_wh(gbox: GeoBox, alignx: int = 16, aligny: Optional[int] = None) -> GeoBox:
    aligny = alignx if aligny is None else aligny
    h, w = gbox.shape
    return GeoBox(align_up(w, alignx), align_up(h, aligny), gbox.affine, gbox.crs)


def zoom_out(gbox: GeoBox, factor: float) -> GeoBox:
    """factor > 1 → fewer, bigger pixels over the same extent."""
    h, w = gbox.shape
    a = gbox.affine * Affine.scale(factor, factor)
    return GeoBox(max(1, int(math.ceil(w / factor))), max(1, int(math.ceil(h / factor))), a, gbox.crs)


def zoom_to(gbox: GeoBox, shape: Tuple[int, int]) -> GeoBox:
    """Same extent, new pixel shape."""
    h, w = gbox.shape
    new_h, new_w = shape
    a = gbox.affine * Affine.scale(w / new_w, h / new_h)
    return GeoBox(new_w, new_h, a, gbox.crs)


class GeoboxTiles:
    """Partition a GeoBox into pixel-chunk sub-geoboxes."""

    def __init__(self, box: GeoBox, tile_shape: Tuple[int, int]):
        self._gbox = box
        self._tile_shape = tile_shape
        self._shape = tuple(
            int(math.ceil(float(N) / n)) for N, n in zip(box.shape, tile_shape)
        )
        self._cache: Dict[Tuple[int, int], GeoBox] = {}

    @property
    def base(self) -> GeoBox:
        return self._gbox

    @property
    def shape(self) -> Tuple[int, int]:
        """Number of chunks (rows, cols)."""
        return self._shape

    def chunk_shape(self, idx: Tuple[int, int]) -> Tuple[int, int]:
        def sz(i: int, n: int, tile_sz: int, total_sz: int) -> int:
            if 0 <= i < n - 1:
                return tile_sz
            if i == n - 1:
                return total_sz - i * tile_sz
            raise IndexError(f"Index {idx} is out of range")

        return tuple(map(sz, idx, self._shape, self._tile_shape, self._gbox.shape))

    def __getitem__(self, idx: Tuple[int, int]) -> GeoBox:
        sub = self._cache.get(idx)
        if sub is not None:
            return sub
        iy, ix = idx
        ny, nx = self.chunk_shape(idx)
        sy, sx = self._tile_shape
        roi = (slice(iy * sy, iy * sy + ny), slice(ix * sx, ix * sx + nx))
        return self._cache.setdefault(idx, gbox_getitem(self._gbox, roi))

    def range_from_bbox(self, bbox: BoundingBox) -> Tuple[range, range]:
        """(rows, cols) ranges of chunks overlapping the bbox: transform
        the bbox into chunk-index space via the inverse affine, then
        clamped floor/ceil."""

        def clamped_range(v1: float, v2: float, n: int) -> range:
            return range(clamp(math.floor(v1), 0, n), clamp(math.ceil(v2), 0, n))

        sy, sx = self._tile_shape
        to_idx = Affine.scale(1.0 / sx, 1.0 / sy) * (~self._gbox.affine)
        bbox = bbox.transform(to_idx)
        ny, nx = self._shape
        xx = clamped_range(bbox.left, bbox.right, nx)
        yy = clamped_range(bbox.bottom, bbox.top, ny)
        return (yy, xx)

    def tiles(self, polygon: MultiPolygon) -> Iterable[Tuple[int, int]]:
        """Chunk indexes whose extent intersects the polygon (CLOSED
        intersects — the reference uses plain shapely ``.intersects`` here,
        so boundary contact counts, unlike the grid-level refine)."""
        l, b, r, t = multipolygon_bbox(polygon)
        yy, xx = self.range_from_bbox(BoundingBox(l, b, r, t))
        for idx in itertools.product(yy, xx):
            eb = self[idx].extent_bbox
            if multipolygon_rect_closed_intersects(polygon, eb.left, eb.bottom, eb.right, eb.top):
                yield idx
