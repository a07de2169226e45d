"""Broadcast-then-shuffle point-in-polygon join (filter–refine).

Reproduces the reference's two-phase spatial join (SURVEY §2.3
cell-observation join): candidate matching on grid-cell index, then exact
geometric refine with ``intersects ∧ ¬touches`` semantics (reference
``datacube/api/grid_workflow.py:168-237`` + ``datacube/api/core.py:933-939``
+ ``datacube/utils/geometry/_base.py:1302-1305``) — re-expressed Spark-first:

1. driver-side: polygons → covering tile set via
   ``GridSpec.tiles_from_geopolygon`` (exact refine at tile granularity,
   i.e. the reference's query-polygon semi-join reduction);
2. ``broadcast`` the (tile → region) candidate table; equi-join pages on
   (tile_x, tile_y) — no shuffle of the big side;
3. refine with a vectorized numpy PIP kernel inside ``mapInPandas``
   (strict interior: boundary points do not match).

Scale notes: the candidate table is |regions| × avg-tiles-per-region rows —
thousands, always broadcastable.  The big side streams through a single
codegen stage + one Arrow-batched refine; zero shuffles.  Skewed hot cells
don't matter here (no shuffle); they matter for the groupBy that typically
follows, which AQE + salting handles (see operators/salt.py).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.grid import GridSpec
from ..geom.polygon import points_strictly_inside_multi, unpack_multipolygon
from .tiling import with_tile


def region_tile_candidates(spark, regions_df: DataFrame, grid: GridSpec) -> DataFrame:
    """(tile_x, tile_y, region_id) — every tile whose interior intersects
    the region's geometry.  Driver-side enumeration over the collected
    (small, broadcast-bound) region table."""
    rows = []
    for r in regions_df.select("region_id", "geom").collect():
        mp = unpack_multipolygon(bytes(r["geom"]))
        for (tx, ty), _ in grid.tiles_from_geopolygon(mp):
            rows.append((int(tx), int(ty), int(r["region_id"])))
    return spark.createDataFrame(rows, "tile_x INT, tile_y INT, region_id INT")


def pip_join(
    pages_df: DataFrame,
    regions_df: DataFrame,
    grid: GridSpec,
    lon: str = "lon",
    lat: str = "lat",
    keep_cols: Optional[list] = None,
) -> DataFrame:
    """Join pages to the regions whose interior strictly contains them.

    Returns pages columns (or ``keep_cols``) + ``region_id``.
    """
    spark = pages_df.sparkSession
    candidates = region_tile_candidates(spark, regions_df, grid)

    tiled = with_tile(pages_df, grid, lon=lon, lat=lat)
    if keep_cols is not None:
        tiled = tiled.select(*keep_cols, lon, lat, "tile_x", "tile_y")

    cand = tiled.join(F.broadcast(candidates), on=["tile_x", "tile_y"], how="inner")

    # executor-side geometry dictionary: region_id -> packed multipolygon
    geom_map: Dict[int, bytes] = {
        int(r["region_id"]): bytes(r["geom"]) for r in regions_df.select("region_id", "geom").collect()
    }
    bc_geoms = spark.sparkContext.broadcast(geom_map)
    out_schema = cand.drop("tile_x", "tile_y").schema

    lon_name, lat_name = lon, lat

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # unpack once per task, not per batch/row
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
            # vectorize per distinct region within the Arrow batch
            for rid in pd.unique(rids):
                m = rids == rid
                keep[m] = points_strictly_inside_multi(xs[m], ys[m], poly_of(int(rid)))
            out = pdf.loc[keep].drop(columns=["tile_x", "tile_y"])
            if len(out):
                yield out

    return cand.mapInPandas(refine, schema=out_schema)
