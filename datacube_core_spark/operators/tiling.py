"""GridSpec tile assignment as Catalyst column expressions.

The reference computes tile indices with ``grid_range`` floor/ceil
arithmetic (reference ``datacube/model/__init__.py:883-908``) and the
grid-range join enumerates every tile overlapping a bbox
(``GridSpec.tiles``, ``:821-852``).  Both are *pure arithmetic*, so instead
of a UDF we compile them to built-in Catalyst expressions:

* point → tile: two ``floor`` calls — whole-stage-codegen'd, pushdown-safe.
* bbox → tiles: ``sequence()`` + ``explode()`` per axis — the reference's
  nested ``grid_range`` loops become a relational flatMap; after the
  explode the tile index is an equi-join/grouping key (SURVEY §2.3
  grid-range join).

Negative-step flip (``grid_range`` with step < 0 maps (lo,hi,step) →
(-hi,-lo,-step)) is applied at compile time since a GridSpec's tile_size
is a plan-time constant.

No UDF ⇒ byte-identical semantics with the pure-python oracle comes from
IEEE-754 determinism of floor/ceil on doubles, verified by the parity
tests in ``tests/test_tiling_spark.py``.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geom.grid import GridSpec


def _axis_index(coord: Column, origin: float, step: float) -> Column:
    """floor((coord - origin)/step) with the grid_range negative-step flip."""
    v = coord - F.lit(origin)
    if step < 0:
        v, step = -v, -step
    return F.floor(v / F.lit(step)).cast("int")


def point_tile_cols(grid: GridSpec, lon: Column, lat: Column) -> Tuple[Column, Column]:
    """(tile_x, tile_y) columns for point coordinates.

    Matches ``GridSpec.point_tile`` (floor rule: a point exactly on a
    shared edge belongs to the greater-side tile, consistent with
    ``grid_range`` enumeration).
    """
    size_y, size_x = grid.tile_size
    origin_y, origin_x = grid.origin
    return _axis_index(lon, origin_x, size_x), _axis_index(lat, origin_y, size_y)


def with_tile(df: DataFrame, grid: GridSpec, lon: str = "lon", lat: str = "lat") -> DataFrame:
    tx, ty = point_tile_cols(grid, F.col(lon), F.col(lat))
    return df.withColumn("tile_x", tx).withColumn("tile_y", ty)


def _axis_range(lo: Column, hi: Column, origin: float, step: float) -> Column:
    """``sequence(floor(lo'/step), ceil(hi'/step) - 1)`` — the grid_range
    half-open enumeration as an array column.  Assumes hi > lo (positive
    span), which guarantees a non-empty ascending sequence."""
    lo_v = lo - F.lit(origin)
    hi_v = hi - F.lit(origin)
    if step < 0:
        lo_v, hi_v, step = -hi_v, -lo_v, -step
    start = F.floor(lo_v / F.lit(step)).cast("int")
    stop = (F.ceil(hi_v / F.lit(step)) - 1).cast("int")
    return F.sequence(start, stop)


def explode_bbox_tiles(
    df: DataFrame,
    grid: GridSpec,
    left: str = "left",
    bottom: str = "bottom",
    right: str = "right",
    top: str = "top",
) -> DataFrame:
    """Grid-range join: one output row per (input row × overlapping tile).

    ``explode`` runs inside whole-stage codegen; the subsequent shuffle on
    (tile_x, tile_y) is the engine's canonical partitioning.  At 100 TB the
    fan-out factor is bounded by bbox size / tile size, so size tiles such
    that typical footprints hit only a few tiles.
    """
    size_y, size_x = grid.tile_size
    origin_y, origin_x = grid.origin
    out = df.withColumn("tile_x", F.explode(_axis_range(F.col(left), F.col(right), origin_x, size_x)))
    out = out.withColumn("tile_y", F.explode(_axis_range(F.col(bottom), F.col(top), origin_y, size_y)))
    return out


def tile_bounds_cols(grid: GridSpec, tile_x: Column, tile_y: Column):
    """(left, bottom, right, top) of a tile — tile_coords' ``+1 if
    resolution<0<size`` top-left rule re-expressed as min/max bounds."""
    size_y, size_x = grid.tile_size
    origin_y, origin_x = grid.origin
    x0 = tile_x * F.lit(size_x) + F.lit(origin_x)
    y0 = tile_y * F.lit(size_y) + F.lit(origin_y)
    left = F.least(x0, x0 + F.lit(size_x))
    right = F.greatest(x0, x0 + F.lit(size_x))
    bottom = F.least(y0, y0 + F.lit(size_y))
    top = F.greatest(y0, y0 + F.lit(size_y))
    return left, bottom, right, top
