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
from ..geom.polygon import multipolygon_bbox, points_strictly_inside_multi, unpack_multipolygon
from .tiling import with_tile


def _pick_level_for(mp, base_x: float, base_y: float, target_cells: int, min_level: int, max_level: int) -> int:
    """Finest lattice level keeping the region's bbox within
    ~target_cells subcells per axis (per-axis tile sizes)."""
    import math as _math

    l, b, r, t = multipolygon_bbox(mp)
    span_x = max(r - l, 1e-9)
    span_y = max(t - b, 1e-9)
    # cells_per_axis = span / (base / 2^L) <= target  per axis
    lim = min(base_x * target_cells / span_x, base_y * target_cells / span_y)
    level = int(_math.floor(_math.log2(lim)))
    return max(min_level, min(max_level, level))


def _classify_region(
    rid: int,
    blob: bytes,
    grid: GridSpec,
    base_x: float,
    base_y: float,
    ox: float,
    oy: float,
    target_cells: int,
    min_level: int,
    max_level: int,
    geobox_cache=None,
):
    """Classification rows for one region — shared by the driver path and
    the distributed mapInPandas path.  Emits tuples
    ``(kind, level, ax, ay, region_id, l, b, r, t)`` with kind 0=rect
    candidate (ax/ay = tile), 1=full subcell, 2=boundary subcell.
    Subcells are tile_size / 2^level PER AXIS, so tile = subcell >> level
    exactly (no float division anywhere in the subcell→tile mapping)."""
    mp = unpack_multipolygon(blob)
    rect = detect_axis_rect(mp)
    out = []
    if rect is not None:
        l, b, r, t = rect
        for (tx, ty), _ in grid.tiles_from_geopolygon(mp, geobox_cache=geobox_cache):
            out.append((0, 0, int(tx), int(ty), rid, l, b, r, t))
        return out, False
    level = _pick_level_for(mp, base_x, base_y, target_cells, min_level, max_level)
    hx = base_x / (1 << level)
    hy = base_y / (1 << level)
    full, bnd = classify_subcells(mp, ox, oy, hx, hy)
    out.extend((1, level, int(cx), int(cy), rid, 0.0, 0.0, 0.0, 0.0) for cx, cy in full)
    out.extend((2, level, int(cx), int(cy), rid, 0.0, 0.0, 0.0, 0.0) for cx, cy in bnd)
    return out, True


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

    # above this many regions, classification (bbox→tiles enumeration +
    # subcell supercover) moves off the driver into a one-off distributed
    # mapInPandas job; the resulting candidate tables are broadcast either
    # way (they must be: they're the small side of the PIP join)
    DISTRIBUTED_CLASSIFY_THRESHOLD = 10_000

    def __init__(
        self,
        spark,
        regions_df: DataFrame,
        grid: GridSpec,
        target_cells_per_axis: int = 48,
        distributed_classify: Optional[bool] = None,
    ):
        import math as _math

        self.grid = grid
        size_y, size_x = grid.tile_size
        # per-axis subcell lattice: tile_size / 2^level on EACH axis, so a
        # subcell never straddles a tile boundary and tile = subcell >> L
        # exactly (rectangular tile grids fully supported)
        self._base_x = abs(size_x)
        self._base_y = abs(size_y)
        self.ox = grid.origin[1]
        self.oy = grid.origin[0]
        self.target_cells = target_cells_per_axis

        if distributed_classify is None:
            # limit-probe, not a full count: deciding the classify mode of
            # a 10^6-region table must not cost a full scan of it
            thresh = self.DISTRIBUTED_CLASSIFY_THRESHOLD
            distributed_classify = (
                regions_df.select(F.lit(1)).limit(thresh + 1).count() > thresh
            )

        self.levels: Dict[int, Tuple[Optional[DataFrame], Optional[DataFrame]]] = {}
        if distributed_classify:
            classified, generic_ids = self._classify_on_executors(spark, regions_df)
            # Driver memory scales with |generic|, not |regions|: only
            # tier-3 (generic) blobs are ever read by the refine kernel,
            # so only THOSE are pulled driver-side for the broadcast —
            # rect regions' WKB never leaves the executors.
            if generic_ids:
                gid_df = spark.createDataFrame([(int(g),) for g in sorted(generic_ids)], "region_id INT")
                collected = (
                    regions_df.join(F.broadcast(gid_df), on="region_id", how="left_semi")
                    .select("region_id", "geom")
                    .collect()
                )
            else:
                collected = []
            self.geom_map: Dict[int, bytes] = {int(r["region_id"]): bytes(r["geom"]) for r in collected}
            rect = classified.where(F.col("kind") == 0).select(
                F.col("ax").cast("int").alias("tile_x"),
                F.col("ay").cast("int").alias("tile_y"),
                "region_id",
                F.col("l").alias("r_left"), F.col("b").alias("r_bottom"),
                F.col("r").alias("r_right"), F.col("t").alias("r_top"),
            )
            self.rect_candidates = rect if len(rect.take(1)) else None
            # distinct (kind, level) pairs are tiny — the per-level tables
            # themselves stay distributed (they are broadcast-join inputs)
            kinds = {(int(x["kind"]), int(x["level"])) for x in classified.select("kind", "level").distinct().collect()}
            for kind, level in sorted(kinds):
                if kind == 0:
                    continue
                part = classified.where((F.col("kind") == kind) & (F.col("level") == level)).select(
                    F.col("ax").alias("sc_x"), F.col("ay").alias("sc_y"), "region_id"
                )
                fdf, bdf = self.levels.get(level, (None, None))
                if kind == 1:
                    fdf = part
                else:
                    bdf = part
                self.levels[level] = (fdf, bdf)
        else:
            collected = regions_df.select("region_id", "geom").collect()
            self.geom_map = {int(r["region_id"]): bytes(r["geom"]) for r in collected}
            rows: List[tuple] = []
            generic_ids = set()
            cache: Dict = {}
            for rid, blob in self.geom_map.items():
                r_rows, is_generic = _classify_region(
                    rid, blob, grid, self._base_x, self._base_y, self.ox, self.oy,
                    self.target_cells, self.MIN_LEVEL, self.MAX_LEVEL, geobox_cache=cache,
                )
                rows.extend(r_rows)
                if is_generic:
                    generic_ids.add(rid)

            rect_rows: List[tuple] = []
            by_level: Dict[int, Tuple[List[tuple], List[tuple]]] = {}
            for kind, level, ax, ay, rid, l, b, r, t in rows:
                if kind == 0:
                    rect_rows.append((ax, ay, rid, l, b, r, t))
                else:
                    fr, br = by_level.setdefault(level, ([], []))
                    (fr if kind == 1 else br).append((ax, ay, rid))
            self.rect_candidates = (
                spark.createDataFrame(
                    rect_rows,
                    "tile_x INT, tile_y INT, region_id INT, r_left DOUBLE, r_bottom DOUBLE, r_right DOUBLE, r_top DOUBLE",
                )
                if rect_rows
                else None
            )
            for level, (fr, br) in by_level.items():
                fdf = spark.createDataFrame(fr, "sc_x LONG, sc_y LONG, region_id INT") if fr else None
                bdf = spark.createDataFrame(br, "sc_x LONG, sc_y LONG, region_id INT") if br else None
                self.levels[level] = (fdf, bdf)

        generic_geoms = {rid: self.geom_map[rid] for rid in generic_ids}
        self._bc_geoms = spark.sparkContext.broadcast(generic_geoms) if generic_geoms else None

    def _pick_level(self, mp) -> int:
        return _pick_level_for(mp, self._base_x, self._base_y, self.target_cells, self.MIN_LEVEL, self.MAX_LEVEL)

    def _classify_on_executors(self, spark, regions_df: DataFrame):
        """One-off distributed classification job: the per-region
        supercover runs on executors; the candidate tables stay
        DISTRIBUTED (localCheckpoint materializes them once) — the driver
        only collects the tiny (kind, level) distinct set and the generic
        region ids, never the candidate rows themselves."""
        grid = self.grid
        base_x, base_y, ox, oy = self._base_x, self._base_y, self.ox, self.oy
        target, min_l, max_l = self.target_cells, self.MIN_LEVEL, self.MAX_LEVEL

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cache: Dict = {}
            for pdf in batches:
                out = []
                for r in pdf.itertuples():
                    r_rows, is_generic = _classify_region(
                        int(r.region_id), bytes(r.geom), grid, base_x, base_y, ox, oy,
                        target, min_l, max_l, geobox_cache=cache,
                    )
                    out.extend(
                        (k, lv, ax, ay, rid, l, b, rr, t, is_generic)
                        for k, lv, ax, ay, rid, l, b, rr, t in r_rows
                    )
                if out:
                    yield pd.DataFrame(
                        out,
                        columns=["kind", "level", "ax", "ay", "region_id", "l", "b", "r", "t", "generic"],
                    )

        schema = (
            "kind INT, level INT, ax LONG, ay LONG, region_id INT, "
            "l DOUBLE, b DOUBLE, r DOUBLE, t DOUBLE, generic BOOLEAN"
        )
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
        classified = (
            regions_df.select("region_id", "geom")
            .repartition(n_parts)
            .mapInPandas(kernel, schema=schema)
            .localCheckpoint(eager=True)
        )
        generic_ids = {
            int(x["region_id"])
            for x in classified.where(F.col("generic")).select("region_id").distinct().collect()
        }
        return classified, generic_ids

    # -- column helpers ----------------------------------------------------

    def _subcell_cols(self, lon: str, lat: str, level: int):
        hx = self._base_x / (1 << level)
        hy = self._base_y / (1 << level)
        scx = F.floor((F.col(lon) - F.lit(self.ox)) / F.lit(hx)).cast("long")
        scy = F.floor((F.col(lat) - F.lit(self.oy)) / F.lit(hy)).cast("long")
        return scx, scy

    def _refine(self, cand: DataFrame, lon: str, lat: str) -> DataFrame:
        """Exact numpy PIP refine of tier-3 candidate rows (thin boundary
        band only) — shared by both join plans.

        Skew note (PERF.md §17, measured): ``cand`` comes from a BROADCAST
        equi-join, so these rows inherit the big side's partitioning — a
        region boundary crossing a hot cell costs ≈1.0× the quiet-band
        wall because the dense band stays spread across input partitions.
        That holds as long as the upstream layout isn't location-sorted;
        a table clustered by (lon, lat) would funnel a hot band into few
        partitions and should be repartitioned before this join."""
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

        return cand.mapInPandas(refine, schema=out_schema)

    def join(
        self,
        pages_df: DataFrame,
        lon: str = "lon",
        lat: str = "lat",
        keep_cols: Optional[list] = None,
        single_scan: bool = True,
    ) -> DataFrame:
        """Join pages to the regions whose interior strictly contains them.

        Returns (keep_cols or all pages columns) + lon/lat + ``region_id``.

        ``single_scan=True`` (default; PERF.md §13 A/B): the lattice tiers
        compute ALL per-level subcell ids in one pass over the big side
        (array + explode, pipelined — no shuffle) and join ONCE against
        the level-tagged union of the full/boundary candidate tables, so
        the big table is read 3× total (rect tier, full join, boundary
        join) instead of 1 + 2·|levels| times — at 100 TB each avoided
        pass is a full table read.  ``False`` keeps the scan-per-level
        plan (one broadcast join per level table)."""
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

        if single_scan and self.levels:
            # one exploded pass: every page row emits its subcell id at
            # EVERY active level (|levels| ≤ MAX_LEVEL−MIN_LEVEL+1 = 7,
            # typically 1-3), then ONE broadcast equi-join per tier against
            # the level-tagged union of the candidate tables.  Internal
            # columns carry a __pip_ prefix so a pages table that already
            # has a `level`/`sc_x` column can't collide (code-review r4).
            LV, SX, SY = "__pip_level", "__pip_scx", "__pip_scy"
            elems = []
            for level in sorted(self.levels):
                scx, scy = self._subcell_cols(lon, lat, level)
                elems.append(
                    F.struct(F.lit(level).alias(LV), scx.alias(SX), scy.alias(SY))
                )
            sub_all = (
                pages_df.select(*base_cols, lon, lat)
                .withColumn("__pip_s", F.explode(F.array(*elems)))
                .select(*base_cols, lon, lat, f"__pip_s.{LV}", f"__pip_s.{SX}", f"__pip_s.{SY}")
            )

            def tagged_union(pick: int) -> Optional[DataFrame]:
                tables = [
                    t[pick].withColumn(LV, F.lit(level))
                    for level, t in sorted(self.levels.items())
                    if t[pick] is not None
                ]
                if not tables:
                    return None
                out = tables[0]
                for t in tables[1:]:
                    out = out.unionByName(t)
                return out.select(
                    LV, F.col("sc_x").alias(SX), F.col("sc_y").alias(SY), "region_id"
                )

            full_union = tagged_union(0)
            bnd_union = tagged_union(1)
            if full_union is not None:
                parts.append(
                    sub_all.join(F.broadcast(full_union), on=[LV, SX, SY], how="inner")
                    .select(*out_cols)
                )
            if bnd_union is not None:
                cand = sub_all.join(
                    F.broadcast(bnd_union), on=[LV, SX, SY], how="inner"
                ).select(*out_cols)
                parts.append(self._refine(cand, lon, lat))
        else:
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
                    parts.append(self._refine(cand, lon, lat))

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
