"""Broadcast-then-shuffle point-in-polygon join (filter–refine).

Reproduces the reference's two-phase spatial join (SURVEY §2.3
cell-observation join): candidate matching on grid-cell index, then exact
refine with ``intersects ∧ ¬touches`` semantics (reference
``datacube/api/grid_workflow.py:168-237``, ``datacube/api/core.py:933-939``,
``datacube/utils/geometry/_base.py:1302-1305``) — re-expressed Spark-first
with a three-tier refine that keeps almost every row inside JVM codegen:

1. **axis-rect regions** → the refine predicate is strict inequalities on
   (lon, lat); attached to the broadcast candidate row and evaluated by
   Catalyst.  Zero Python.
2. **generic polygons, "full" subcells** → driver-side classification
   (``geom.classify``) finds subcells strictly interior to the polygon;
   pages in them match by a broadcast equi-join alone.  Zero Python.
3. **generic polygons, boundary subcells** → only this thin band (edge
   supercover cells) goes through the vectorized numpy PIP kernel in
   ``mapInPandas``.

Rationale: the JVM↔Python Arrow boundary is a measured throughput ceiling
(~4M rows/s in this sandbox regardless of cores); at 100 TB the same
principle holds — rows crossing into Python must be a small fraction.
The candidate/classification tables are |regions| × tiles-per-region —
broadcastable; the big side never shuffles before its aggregation.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.classify import classify_subcells, detect_axis_rect
from ..geom.grid import GridSpec
from ..geom.polygon import points_strictly_inside_multi, unpack_multipolygon
from .tiling import with_tile


class PipIndex:
    """Build-once spatial index of a (small) region table over a GridSpec.

    Generic-polygon classification uses an ADAPTIVE subcell lattice: each
    region is classified at h = tile_size / 2^L with L chosen so its bbox
    spans ~``target_cells_per_axis`` subcells — small regions get fine
    lattices (thin boundary bands, few refine rows), large regions coarse
    ones (bounded broadcast size).  Regions sharing a level share one
    (level, sc_x, sc_y) join.
    """

    MIN_LEVEL = 2
    MAX_LEVEL = 8

    def __init__(
        self,
        spark,
        regions_df: DataFrame,
        grid: GridSpec,
        target_cells_per_axis: int = 48,
    ):
        import math as _math

        self.grid = grid
        size_y, size_x = grid.tile_size
        # the subcell lattice (classify_subcells, _subcell_cols, and the
        # subcell→tile arithmetic in rasterize_generic_regions) is square;
        # a rectangular tile would make subcells straddle tile boundaries
        # on the longer axis — fail loudly instead of mis-assigning
        if abs(size_x) != abs(size_y):
            raise ValueError(
                f"PipIndex requires |tile_size.x| == |tile_size.y| "
                f"(got {abs(size_x)} x {abs(size_y)}); per-axis subcell "
                "lattices are not implemented"
            )
        self._base = min(abs(size_x), abs(size_y))
        self.ox = grid.origin[1]
        self.oy = grid.origin[0]
        self.target_cells = target_cells_per_axis

        collected = regions_df.select("region_id", "geom").collect()
        self.geom_map: Dict[int, bytes] = {int(r["region_id"]): bytes(r["geom"]) for r in collected}

        rect_rows: List[tuple] = []
        # level -> (full rows, boundary rows)
        by_level: Dict[int, Tuple[List[tuple], List[tuple]]] = {}
        generic_geoms: Dict[int, bytes] = {}
        cache: Dict = {}

        for rid, blob in self.geom_map.items():
            mp = unpack_multipolygon(blob)
            rect = detect_axis_rect(mp)
            if rect is not None:
                l, b, r, t = rect
                for (tx, ty), _ in grid.tiles_from_geopolygon(mp, geobox_cache=cache):
                    rect_rows.append((int(tx), int(ty), rid, l, b, r, t))
            else:
                generic_geoms[rid] = blob
                level = self._pick_level(mp)
                h = self._base / (1 << level)
                full, bnd = classify_subcells(mp, self.ox, self.oy, h)
                fr, br = by_level.setdefault(level, ([], []))
                fr.extend((int(cx), int(cy), rid) for cx, cy in full)
                br.extend((int(cx), int(cy), rid) for cx, cy in bnd)

        self.rect_candidates = (
            spark.createDataFrame(
                rect_rows,
                "tile_x INT, tile_y INT, region_id INT, r_left DOUBLE, r_bottom DOUBLE, r_right DOUBLE, r_top DOUBLE",
            )
            if rect_rows
            else None
        )
        # per-level classification tables
        self.levels: Dict[int, Tuple[Optional[DataFrame], Optional[DataFrame]]] = {}
        for level, (fr, br) in by_level.items():
            fdf = spark.createDataFrame(fr, "sc_x LONG, sc_y LONG, region_id INT") if fr else None
            bdf = spark.createDataFrame(br, "sc_x LONG, sc_y LONG, region_id INT") if br else None
            self.levels[level] = (fdf, bdf)
        self._bc_geoms = spark.sparkContext.broadcast(generic_geoms) if generic_geoms else None

    def _pick_level(self, mp) -> int:
        """Finest level whose lattice keeps the region's bbox within
        ~target_cells_per_axis subcells per axis."""
        import math as _math

        from ..geom.polygon import multipolygon_bbox

        l, b, r, t = multipolygon_bbox(mp)
        span = max(r - l, t - b, 1e-9)
        ideal_h = span / self.target_cells
        level = int(_math.floor(_math.log2(self._base / ideal_h)))
        return max(self.MIN_LEVEL, min(self.MAX_LEVEL, level))

    # -- column helpers ----------------------------------------------------

    def _subcell_cols(self, lon: str, lat: str, level: int):
        h = self._base / (1 << level)
        scx = F.floor((F.col(lon) - F.lit(self.ox)) / F.lit(h)).cast("long")
        scy = F.floor((F.col(lat) - F.lit(self.oy)) / F.lit(h)).cast("long")
        return scx, scy

    def join(
        self,
        pages_df: DataFrame,
        lon: str = "lon",
        lat: str = "lat",
        keep_cols: Optional[list] = None,
    ) -> DataFrame:
        """Join pages to the regions whose interior strictly contains them.

        Returns (keep_cols or all pages columns) + lon/lat + ``region_id``.
        """
        base_cols = keep_cols if keep_cols is not None else [c for c in pages_df.columns if c not in (lon, lat)]
        out_cols = [*base_cols, lon, lat, "region_id"]
        parts: List[DataFrame] = []

        # tier 1: axis-rect regions — Catalyst-only
        if self.rect_candidates is not None:
            tiled = with_tile(pages_df, self.grid, lon=lon, lat=lat).select(
                *base_cols, lon, lat, "tile_x", "tile_y"
            )
            rect = (
                tiled.join(F.broadcast(self.rect_candidates), on=["tile_x", "tile_y"], how="inner")
                .where(
                    (F.col(lon) > F.col("r_left"))
                    & (F.col(lon) < F.col("r_right"))
                    & (F.col(lat) > F.col("r_bottom"))
                    & (F.col(lat) < F.col("r_top"))
                )
                .select(*out_cols)
            )
            parts.append(rect)

        for level, (full_cells, boundary_cells) in sorted(self.levels.items()):
            scx, scy = self._subcell_cols(lon, lat, level)
            sub = pages_df.select(*base_cols, lon, lat).withColumn("sc_x", scx).withColumn("sc_y", scy)

            # tier 2: interior subcells — equi-join alone proves membership
            if full_cells is not None:
                parts.append(
                    sub.join(F.broadcast(full_cells), on=["sc_x", "sc_y"], how="inner").select(*out_cols)
                )

            # tier 3: boundary subcells — exact numpy refine on the thin band
            if boundary_cells is not None:
                cand = sub.join(F.broadcast(boundary_cells), on=["sc_x", "sc_y"], how="inner").select(
                    *out_cols
                )
                bc_geoms = self._bc_geoms
                lon_name, lat_name = lon, lat
                out_schema = cand.schema

                def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                    cache: Dict[int, object] = {}

                    def poly_of(rid: int):
                        mp = cache.get(rid)
                        if mp is None:
                            mp = unpack_multipolygon(bc_geoms.value[rid])
                            cache[rid] = mp
                        return mp

                    for pdf in batches:
                        if len(pdf) == 0:
                            continue
                        keep = np.zeros(len(pdf), dtype=bool)
                        xs = pdf[lon_name].to_numpy(dtype=np.float64)
                        ys = pdf[lat_name].to_numpy(dtype=np.float64)
                        rids = pdf["region_id"].to_numpy()
                        for rid in pd.unique(rids):
                            m = rids == rid
                            keep[m] = points_strictly_inside_multi(xs[m], ys[m], poly_of(int(rid)))
                        out = pdf.loc[keep]
                        if len(out):
                            yield out

                parts.append(cand.mapInPandas(refine, schema=out_schema))

        if not parts:
            raise ValueError("PipIndex built from an empty region table")
        result = parts[0]
        for p in parts[1:]:
            result = result.unionByName(p)
        return result


def region_tile_candidates(spark, regions_df: DataFrame, grid: GridSpec) -> DataFrame:
    """(tile_x, tile_y, region_id) — every tile whose interior intersects
    the region's geometry (standalone helper for tests)."""
    rows: List[tuple] = []
    cache: Dict = {}
    for r in regions_df.select("region_id", "geom").collect():
        mp = unpack_multipolygon(bytes(r["geom"]))
        for (tx, ty), _ in grid.tiles_from_geopolygon(mp, geobox_cache=cache):
            rows.append((int(tx), int(ty), int(r["region_id"])))
    return spark.createDataFrame(rows, "tile_x INT, tile_y INT, region_id INT")


def pip_join(
    pages_df: DataFrame,
    regions_df: DataFrame,
    grid: GridSpec,
    lon: str = "lon",
    lat: str = "lat",
    keep_cols: Optional[list] = None,
    index: Optional[PipIndex] = None,
) -> DataFrame:
    """Convenience wrapper: build (or reuse) a PipIndex and join."""
    if index is None:
        index = PipIndex(pages_df.sparkSession, regions_df, grid)
    return index.join(pages_df, lon=lon, lat=lat, keep_cols=keep_cols)
