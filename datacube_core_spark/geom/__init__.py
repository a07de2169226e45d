"""Pure-python/numpy geometry core — no Spark dependency.

This package is both the reference oracle for tests and the kernel
library imported inside Arrow/pandas UDFs on executors.
"""

from .affine import Affine
from .bbox import BoundingBox, bbox_intersection, bbox_union
from .grid import (
    GRID_A,
    GRID_B,
    GRID_C,
    GRID_D,
    GRID_E,
    GRID_MERC,
    GRID_PAGES,
    GeoBox,
    GridSpec,
    align_pix,
    grid_range,
)
from .polygon import (
    box_ring,
    clipped_area,
    interiors_intersect,
    multipolygon_bbox,
    pack_multipolygon,
    points_strictly_inside,
    points_strictly_inside_multi,
    polygon_area,
    polygon_bbox,
    rect_interiors_intersect,
    ring_area,
    unpack_multipolygon,
)

__all__ = [
    "Affine",
    "BoundingBox",
    "bbox_intersection",
    "bbox_union",
    "GeoBox",
    "GridSpec",
    "align_pix",
    "grid_range",
    "GRID_A",
    "GRID_B",
    "GRID_C",
    "GRID_D",
    "GRID_E",
    "GRID_MERC",
    "GRID_PAGES",
    "box_ring",
    "clipped_area",
    "interiors_intersect",
    "multipolygon_bbox",
    "pack_multipolygon",
    "points_strictly_inside",
    "points_strictly_inside_multi",
    "polygon_area",
    "polygon_bbox",
    "rect_interiors_intersect",
    "ring_area",
    "unpack_multipolygon",
]
