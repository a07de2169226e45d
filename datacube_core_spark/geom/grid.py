"""GridSpec / GeoBox tile math — the deterministic core of the engine.

Semantics reproduce the reference engine exactly (these functions ARE the
correctness oracle for the Spark operators):

* ``grid_range``       — reference ``datacube/model/__init__.py:883-908``
  (floor/ceil with negative-step flip; doctest vectors reproduced below).
* ``GridSpec.tile_coords`` — ``datacube/model/__init__.py:799-807``
  (the ``+1 if resolution < 0 < size`` top-left rule).
* ``GridSpec.tiles`` / ``tiles_from_geopolygon`` —
  ``datacube/model/__init__.py:821-881``.
* ``_align_pix`` / ``GeoBox.from_geopolygon`` —
  ``datacube/utils/geometry/_base.py:995-1045`` (0.1*res epsilon snap).
* exact-intersection refine uses ``intersects ∧ ¬touches``
  (``_base.py:1302-1305``) via the pure-numpy kernels in ``polygon.py``.

All re-implemented from the documented/tested behavior; numeric edge rules
kept bit-identical so tile assignments match the reference row-for-row
(BASELINE.md correctness gate).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .affine import Affine
from .bbox import BoundingBox
from .polygon import (
    MultiPolygon,
    box_ring,
    multipolygon_bbox,
    multipolygon_rect_interiors_intersect,
)

TileIndex = Tuple[int, int]


def grid_range(lower: float, upper: float, step: float) -> range:
    """Indices along a 1-D scale; used to enumerate 2-D grid indices.

    >>> list(grid_range(-4.0, -1.0, 3.0))
    [-2, -1]
    >>> list(grid_range(1.0, 4.0, -3.0))
    [-2, -1]
    >>> list(grid_range(-3.0, 0.0, 3.0))
    [-1]
    >>> list(grid_range(-2.0, 1.0, 3.0))
    [-1, 0]
    >>> list(grid_range(-1.0, 2.0, 3.0))
    [-1, 0]
    >>> list(grid_range(0.0, 3.0, 3.0))
    [0]
    >>> list(grid_range(1.0, 4.0, 3.0))
    [0, 1]
    """
    if step < 0.0:
        lower, upper, step = -upper, -lower, -step
    assert step > 0.0
    return range(int(math.floor(lower / step)), int(math.ceil(upper / step)))


def align_pix(left: float, right: float, res: float, off: float) -> Tuple[float, int]:
    """Snap an extent to the pixel lattice; returns (origin, n_pixels).

    Matches the reference ``_align_pix`` including the 0.1*res epsilon that
    absorbs float jitter when the extent is already aligned.
    """
    if res < 0:
        res = -res
        val = math.ceil((right - off) / res) * res + off
        width = max(1, int(math.ceil((val - left - 0.1 * res) / res)))
    else:
        val = math.floor((left - off) / res) * res + off
        width = max(1, int(math.ceil((right - val - 0.1 * res) / res)))
    return val, width


class GeoBox:
    """A rectangular pixel grid located by an affine transform + CRS name.

    CRS here is a plain string tag (no pyproj in this environment); all
    grid math is CRS-agnostic arithmetic, matching the reference GeoBox's
    behavior for same-CRS workflows.
    """

    __slots__ = ("width", "height", "affine", "crs")

    def __init__(self, width: int, height: int, affine: Affine, crs: Optional[str] = None):
        self.width = int(width)
        self.height = int(height)
        self.affine = affine
        self.crs = crs

    @classmethod
    def from_bbox(
        cls,
        bbox: BoundingBox,
        resolution: Tuple[float, float],
        crs: Optional[str] = None,
        align: Optional[Tuple[float, float]] = None,
    ) -> "GeoBox":
        """GeoBox covering a bbox, snapped to the pixel lattice
        (reference ``GeoBox.from_geopolygon`` bbox path)."""
        align = align or (0.0, 0.0)
        offx, width = align_pix(bbox.left, bbox.right, resolution[1], align[1])
        offy, height = align_pix(bbox.bottom, bbox.top, resolution[0], align[0])
        affine = Affine.translation(offx, offy) * Affine.scale(resolution[1], resolution[0])
        return cls(width=width, height=height, affine=affine, crs=crs)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.height, self.width)

    @property
    def resolution(self) -> Tuple[float, float]:
        """(y_res, x_res)"""
        return (self.affine.e, self.affine.a)

    @property
    def extent_bbox(self) -> BoundingBox:
        """Bounds of the full pixel grid in CRS units."""
        x0, y0 = self.affine * (0, 0)
        x1, y1 = self.affine * (self.width, self.height)
        return BoundingBox.from_points((x0, y0), (x1, y1))

    @property
    def extent_ring(self) -> np.ndarray:
        bb = self.extent_bbox
        return box_ring(bb.left, bb.bottom, bb.right, bb.top)

    def buffered(self, ybuff: float, xbuff: float) -> "GeoBox":
        """Pad by (ybuff, xbuff) CRS units, rounded out to whole pixels
        (reference ``GeoBox.buffered`` + ``_round_to_res`` 0.1 epsilon)."""

        def round_to_res(value: float, res: float) -> int:
            res = abs(res)
            return int(math.ceil((value - 0.1 * res) / res))

        res_y, res_x = self.resolution
        by, bx = round_to_res(ybuff, res_y), round_to_res(xbuff, res_x)
        affine = self.affine * Affine.translation(-bx, -by)
        return GeoBox(self.width + 2 * bx, self.height + 2 * by, affine, self.crs)

    def coordinates(self) -> Tuple[np.ndarray, np.ndarray]:
        """Pixel-center axis values (y_axis, x_axis) — reference
        ``GeoBox.coordinates`` (``_base.py:1134-1148``)."""
        res_y, res_x = self.resolution
        x0, y0 = self.affine * (0, 0)
        xs = x0 + res_x * (np.arange(self.width, dtype=np.float64) + 0.5)
        ys = y0 + res_y * (np.arange(self.height, dtype=np.float64) + 0.5)
        return ys, xs

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, GeoBox)
            and self.shape == other.shape
            and self.affine == other.affine
            and self.crs == other.crs
        )

    def __hash__(self):
        return hash((self.height, self.width, self.crs, self.affine))

    def __repr__(self) -> str:
        return f"GeoBox({self.width}, {self.height}, {self.affine!r}, {self.crs})"


class GridSpec:
    """Regular tiling of a CRS plane: ``crs, tile_size, resolution, origin``.

    ``tile_size``/``resolution``/``origin`` are (Y, X) tuples; tile indices
    are (x, y) — the reference keeps this inversion and so do we.
    """

    def __init__(
        self,
        crs: str,
        tile_size: Tuple[float, float],
        resolution: Tuple[float, float],
        origin: Optional[Tuple[float, float]] = None,
    ):
        self.crs = crs
        self.tile_size = tile_size
        self.resolution = resolution
        self.origin = origin or (0.0, 0.0)

    def __eq__(self, other):
        return (
            isinstance(other, GridSpec)
            and self.crs == other.crs
            and self.tile_size == other.tile_size
            and self.resolution == other.resolution
            and self.origin == other.origin
        )

    def __hash__(self):
        return hash((self.crs, self.tile_size, self.resolution, self.origin))

    @property
    def tile_resolution(self) -> Tuple[int, int]:
        """Tile size in pixels, (y, x)."""
        return tuple(int(abs(ts / res)) for ts, res in zip(self.tile_size, self.resolution))

    @property
    def alignment(self) -> Tuple[float, float]:
        return tuple(orig % abs(res) for orig, res in zip(self.origin, self.resolution))

    def tile_coords(self, tile_index: TileIndex) -> Tuple[float, float]:
        """(Y, X) coordinate of the tile's top-left corner.

        The ``+1 if resolution < 0 < size`` rule places the anchor at the
        tile's *top* edge when y-resolution is negative but tile size
        positive (row order top-down) — must match the reference exactly.
        """

        def coord(index: int, resolution: float, size: float, origin: float) -> float:
            return (index + (1 if resolution < 0 < size else 0)) * size + origin

        y, x = (
            coord(index, res, size, origin)
            for index, res, size, origin in zip(
                tile_index[::-1], self.resolution, self.tile_size, self.origin
            )
        )
        return (y, x)

    def tile_geobox(self, tile_index: TileIndex) -> GeoBox:
        res_y, res_x = self.resolution
        y, x = self.tile_coords(tile_index)
        h, w = self.tile_resolution
        return GeoBox(
            width=w,
            height=h,
            affine=Affine(res_x, 0.0, x, 0.0, res_y, y),
            crs=self.crs,
        )

    def tile_bbox(self, tile_index: TileIndex) -> BoundingBox:
        return self.tile_geobox(tile_index).extent_bbox

    def tiles(
        self, bounds: BoundingBox, geobox_cache: Optional[Dict] = None
    ) -> Iterator[Tuple[TileIndex, GeoBox]]:
        """All (tile_index, GeoBox) whose grid cell overlaps ``bounds``.

        Uses closed/half-open ``grid_range`` arithmetic — no geometry is
        materialized, which is what makes this pushdown-friendly at scale.
        """

        def geobox(tile_index: TileIndex) -> GeoBox:
            if geobox_cache is None:
                return self.tile_geobox(tile_index)
            gb = geobox_cache.get(tile_index)
            if gb is None:
                gb = self.tile_geobox(tile_index)
                geobox_cache[tile_index] = gb
            return gb

        tile_size_y, tile_size_x = self.tile_size
        origin_y, origin_x = self.origin
        for y in grid_range(bounds.bottom - origin_y, bounds.top - origin_y, tile_size_y):
            for x in grid_range(bounds.left - origin_x, bounds.right - origin_x, tile_size_x):
                yield (x, y), geobox((x, y))

    def tiles_from_geopolygon(
        self,
        geopolygon: MultiPolygon,
        tile_buffer: Optional[Tuple[float, float]] = None,
        geobox_cache: Optional[Dict] = None,
    ) -> Iterator[Tuple[TileIndex, GeoBox]]:
        """bbox candidate enumeration + exact interior-intersection refine
        (the two-phase filter–refine join at the heart of the engine)."""
        l, b, r, t = multipolygon_bbox(geopolygon)
        bbox = BoundingBox(l, b, r, t)
        if tile_buffer:
            bbox = bbox.buffered(*tile_buffer)
        for tile_index, tile_geobox in self.tiles(bbox, geobox_cache):
            if tile_buffer:
                tile_geobox = tile_geobox.buffered(*tile_buffer)
            tb = tile_geobox.extent_bbox
            if multipolygon_rect_interiors_intersect(geopolygon, tb.left, tb.bottom, tb.right, tb.top):
                yield tile_index, tile_geobox

    def point_tile(self, x: float, y: float) -> TileIndex:
        """Tile index containing a point (floor rule, consistent with
        ``grid_range``: a point exactly on a shared tile edge belongs to
        the tile on the greater side)."""
        tile_size_y, tile_size_x = self.tile_size
        origin_y, origin_x = self.origin
        sx = -tile_size_x if tile_size_x < 0 else tile_size_x
        sy = -tile_size_y if tile_size_y < 0 else tile_size_y
        vx = -(x - origin_x) if tile_size_x < 0 else (x - origin_x)
        vy = -(y - origin_y) if tile_size_y < 0 else (y - origin_y)
        return (int(math.floor(vx / sx)), int(math.floor(vy / sy)))

    def __str__(self) -> str:
        return f"GridSpec(crs={self.crs}, tile_size={self.tile_size}, resolution={self.resolution})"

    __repr__ = __str__


# Canonical test grids (FIXTURES.md §3 — parameters from reference tests so
# expected outputs are known; values only, no code copied).
GRID_A = GridSpec("EPSG:4326", tile_size=(1, 1), resolution=(-0.1, 0.1), origin=(10, 10))
GRID_B = GridSpec("EPSG:4326", tile_size=(1, 1), resolution=(-0.1, 0.1), origin=(-50.05, 139.95))
GRID_C = GridSpec("EPSG:3577", tile_size=(100000, 100000), resolution=(-25, 25), origin=(0, 0))
GRID_D = GridSpec(
    "EPSG:5070", tile_size=(-150000, 150000), resolution=(-30, 30), origin=(3314800, -2565600)
)
GRID_E = GridSpec("EPSG:4326", tile_size=(100, 100), resolution=(-10, 10), origin=(0, 0))

# Default grid for the pages engine: whole-degree tiles over lon/lat.
GRID_PAGES = GridSpec("EPSG:4326", tile_size=(4.0, 4.0), resolution=(-0.01, 0.01), origin=(-90.0, -180.0))

# Web-Mercator output grid for the cross-CRS warp path.  The origin is
# deliberately NOT a multiple of the pixel size away from y=0: merc_y(0)
# is a libm-sensitive ~±1e-16, so y=0 must sit mid-pixel, never on a
# pixel/tile boundary (floor() would otherwise disagree across engines).
GRID_MERC = GridSpec(
    "EPSG:3857",
    tile_size=(2_048_000.0, 2_048_000.0),
    resolution=(-256_000.0, 256_000.0),
    origin=(-20_864_000.0, -20_864_000.0),
)
