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

from typing import Dict, Iterator, List, Optional

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

    ``subcell_div``: generic-polygon classification granularity — the
    subcell lattice is tile_size / subcell_div.
    """

    def __init__(self, spark, regions_df: DataFrame, grid: GridSpec, subcell_div: int = 16):
        self.grid = grid
        self.subcell_div = subcell_div
        size_y, size_x = grid.tile_size
        self.hx = abs(size_x) / subcell_div
        self.hy = abs(size_y) / subcell_div
        self.ox = grid.origin[1]
        self.oy = grid.origin[0]

        collected = regions_df.select("region_id", "geom").collect()
        self.geom_map: Dict[int, bytes] = {int(r["region_id"]): bytes(r["geom"]) for r in collected}

        rect_rows: List[tuple] = []
        full_rows: List[tuple] = []
        bnd_rows: List[tuple] = []
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
                if self.hx != self.hy:
                    # classification lattice must be square in index math;
                    # fall back to per-axis handling via the finer pitch
                    h = min(self.hx, self.hy)
                else:
                    h = self.hx
                full, bnd = classify_subcells(mp, self.ox, self.oy, h)
                full_rows.extend((int(cx), int(cy), rid) for cx, cy in full)
                bnd_rows.extend((int(cx), int(cy), rid) for cx, cy in bnd)
                self._h = h

        self._h = getattr(self, "_h", min(self.hx, self.hy))
        self.rect_candidates = (
            spark.createDataFrame(
                rect_rows,
                "tile_x INT, tile_y INT, region_id INT, r_left DOUBLE, r_bottom DOUBLE, r_right DOUBLE, r_top DOUBLE",
            )
            if rect_rows
            else None
        )
        self.full_cells = (
            spark.createDataFrame(full_rows, "sc_x LONG, sc_y LONG, region_id INT") if full_rows else None
        )
        self.boundary_cells = (
            spark.createDataFrame(bnd_rows, "sc_x LONG, sc_y LONG, region_id INT") if bnd_rows else None
        )
        self._bc_geoms = spark.sparkContext.broadcast(generic_geoms) if generic_geoms else None

    # -- column helpers ----------------------------------------------------

    def _subcell_cols(self, lon: str, lat: str):
        h = self._h
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

        if self.full_cells is not None or self.boundary_cells is not None:
            scx, scy = self._subcell_cols(lon, lat)
            sub = pages_df.select(*base_cols, lon, lat).withColumn("sc_x", scx).withColumn("sc_y", scy)

            # tier 2: interior subcells — equi-join alone proves membership
            if self.full_cells is not None:
                parts.append(
                    sub.join(F.broadcast(self.full_cells), on=["sc_x", "sc_y"], how="inner").select(*out_cols)
                )

            # tier 3: boundary subcells — exact numpy refine on the thin band
            if self.boundary_cells is not None:
                cand = sub.join(F.broadcast(self.boundary_cells), on=["sc_x", "sc_y"], how="inner").select(
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
