"""Distributed warp operator: parity with the single-machine kernel,
plan-shape assertions, and non-nearest modes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom import GRID_MERC, GRID_PAGES
from datacube_core_spark.geom.affine import Affine
from datacube_core_spark.geom.grid import GeoBox
from datacube_core_spark.geom.warp import reproject
from datacube_core_spark.operators.raster import rasterize_rect_regions
from datacube_core_spark.operators.warp import (
    merc_region_tiles,
    sample_merc_rasters,
    warp_rasters_to_grid,
)
from datacube_core_spark.sources.regions import regions

RES_SRC = 1.0
RES_DST = 256_000.0


@pytest.fixture(scope="module")
def warped(spark):
    regs = regions(spark)
    src = rasterize_rect_regions(regs, GRID_PAGES, res=RES_SRC)
    cand = merc_region_tiles(regs, GRID_MERC)
    return warp_rasters_to_grid(src, GRID_PAGES, RES_SRC, GRID_MERC, RES_DST, cand, "nearest")


def _local_warp_tile(dst_tx, dst_ty, region_bounds_fn, region_id):
    """Single-machine recompute of one warped dst tile: build the full
    (not tiled) src raster for the region window and reproject once."""
    from datacube_core_spark.sources.regions import region_bounds

    l, b, r, t = region_bounds(region_id)
    # full src plane over the whole world at 1 deg (small enough for a test)
    w, h = 360, 180
    s_gbox = GeoBox(w, h, Affine(1.0, 0.0, -180.0, 0.0, -1.0, 90.0), "EPSG:4326")
    xs = -180.0 + (np.arange(w) + 0.5)
    ys = 90.0 - (np.arange(h) + 0.5)
    XX, YY = np.meshgrid(xs, ys)
    src = ((XX > l) & (XX < r) & (YY > b) & (YY < t)).astype(np.int32)

    d_sx = abs(GRID_MERC.tile_size[1])
    d_left = dst_tx * d_sx + GRID_MERC.origin[1]
    d_top = (dst_ty + 1) * abs(GRID_MERC.tile_size[0]) + GRID_MERC.origin[0]
    d_gbox = GeoBox(8, 8, Affine(RES_DST, 0.0, d_left, 0.0, -RES_DST, d_top), "EPSG:3857")
    dst = np.full((8, 8), -1, dtype=np.int32)
    reproject(src, dst, s_gbox, d_gbox, "nearest", dst_nodata=-1)
    return np.maximum(dst, 0)  # outside world / no coverage -> 0


def test_distributed_warp_matches_single_machine(spark, warped):
    rows = warped.where(F.col("region_id").isin([0, 37, 120, 239])).collect()
    assert rows, "no warped tiles for sampled regions"
    checked = 0
    for r in rows[:40]:
        exp = _local_warp_tile(int(r["dst_tx"]), int(r["dst_ty"]), None, int(r["region_id"]))
        got = np.array(r["raster"], dtype=np.int32).reshape(8, 8)
        np.testing.assert_array_equal(got, exp, err_msg=str((r["dst_tx"], r["dst_ty"], r["region_id"])))
        checked += 1
    assert checked >= 10


def test_warp_plan_shape(spark, warped):
    plan = warped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the warp kernel is the ONLY Python stage in the whole pipeline
    assert plan.count("MapInPandas") == 1
    assert "EvalPython" not in plan  # no row-at-a-time Python anywhere


def test_warp_sampling_nontrivial(spark, warped):
    from datacube_core_spark.sources.pages import pages

    p = (
        pages(spark, "/root/testdata/sf0.001", repl=2)
        .where((F.col("lat") > -85.0) & (F.col("lat") < 85.0))
        .select("doc_id", "lon", "lat")
    )
    out = sample_merc_rasters(p, warped, GRID_MERC, RES_DST)
    vals = out.groupBy("value").count().collect()
    by = {int(r["value"]): int(r["count"]) for r in vals}
    assert by.get(1, 0) > 0 and by.get(0, 0) > 0


def test_distributed_warp_bilinear_average_modes(spark):
    """Non-nearest modes run distributed and keep 0/1 bounds."""
    regs = regions(spark).where(F.col("region_id").isin([100, 101]))
    src = rasterize_rect_regions(regs, GRID_PAGES, res=RES_SRC)
    cand = merc_region_tiles(regs, GRID_MERC)
    for mode in ("bilinear", "average"):
        warpd = warp_rasters_to_grid(src, GRID_PAGES, RES_SRC, GRID_MERC, RES_DST, cand, mode)
        arrs = [np.array(r["raster"]) for r in warpd.collect()]
        assert arrs
        allv = np.concatenate(arrs)
        assert allv.min() >= 0 and allv.max() <= 1
        assert allv.max() == 1  # interior survives under both modes


def test_warp_rejects_negative_src_pixels(spark):
    """The -1 in-band fuse sentinel is only lossless for non-negative
    rasters; the kernel must raise on signed input, not corrupt it."""
    regs = regions(spark)
    # take a REAL rasterized tile (guaranteed to survive the candidate
    # join) and flip one pixel negative
    src = rasterize_rect_regions(regs, GRID_PAGES, res=RES_SRC).limit(1)
    src = src.withColumn(
        "raster",
        F.concat(F.array(F.lit(-7)), F.slice("raster", 2, F.size("raster") - F.lit(1))),
    )
    cand = merc_region_tiles(regs, GRID_MERC)
    out = warp_rasters_to_grid(src, GRID_PAGES, RES_SRC, GRID_MERC, RES_DST, cand, "nearest")
    with pytest.raises(Exception, match="non-negative src pixels"):
        out.collect()


def test_warp_signed_fuse_preserves_negatives(spark):
    """fuse='signed' warps arbitrary signed payloads losslessly: per-tile
    output equals a single-machine reproject of the same signed plane."""
    from datacube_core_spark.sources.regions import region_bounds, regions

    rid = 120
    l, b, r, t = region_bounds(rid)
    regs = regions(spark).where(F.col("region_id") == rid)

    # signed payload: value = (ix - iy) inside the region, 0 outside
    w, h = 360, 180
    xs = -180.0 + (np.arange(w) + 0.5)
    ys = 90.0 - (np.arange(h) + 0.5)
    XX, YY = np.meshgrid(xs, ys)
    inside = (XX > l) & (XX < r) & (YY > b) & (YY < t)
    plane = np.where(inside, (XX.astype(np.int32) - YY.astype(np.int32)), 0).astype(np.int32)
    assert plane.min() < 0, "test plane must contain negative values"

    # split the plane into GRID_PAGES tiles (4 deg = 4 px at 1 deg/px)
    sh = sw = 4
    rows = []
    for ty in range(0, 180 // sh):
        for tx in range(0, 360 // sw):
            arr = plane[180 - (ty + 1) * sh : 180 - ty * sh, tx * sw : (tx + 1) * sw]
            if arr.any():
                rows.append((tx - 0, ty - 0, rid, sh, sw, arr.ravel().tolist()))
    # tile indices relative to the grid origin (-180, -90): tile 0 starts there
    src = spark.createDataFrame(
        [(tx, ty, rg, hh, ww, a) for (tx, ty, rg, hh, ww, a) in rows],
        "tile_x INT, tile_y INT, region_id INT, h INT, w INT, raster ARRAY<INT>",
    )
    cand = merc_region_tiles(regs, GRID_MERC)
    out = warp_rasters_to_grid(
        src, GRID_PAGES, RES_SRC, GRID_MERC, RES_DST, cand, "nearest", fuse="signed"
    ).collect()
    assert out

    from datacube_core_spark.geom.warp import reproject as _rp

    s_gbox = GeoBox(w, h, Affine(1.0, 0.0, -180.0, 0.0, -1.0, 90.0), "EPSG:4326")
    d_sx = abs(GRID_MERC.tile_size[1])
    checked = saw_negative = 0
    for rr in out[:40]:
        d_left = rr["dst_tx"] * d_sx + GRID_MERC.origin[1]
        d_top = (rr["dst_ty"] + 1) * abs(GRID_MERC.tile_size[0]) + GRID_MERC.origin[0]
        d_gbox = GeoBox(8, 8, Affine(RES_DST, 0.0, d_left, 0.0, -RES_DST, d_top), "EPSG:3857")
        exp = np.full((8, 8), -(1 << 31), dtype=np.int32)
        _rp(plane, exp, s_gbox, d_gbox, "nearest", dst_nodata=-(1 << 31))
        exp = np.where(exp == -(1 << 31), 0, exp)
        got = np.array(rr["raster"], dtype=np.int32).reshape(8, 8)
        np.testing.assert_array_equal(got, exp, err_msg=str((rr["dst_tx"], rr["dst_ty"])))
        checked += 1
        if (got < 0).any():
            saw_negative += 1
    assert checked >= 3 and saw_negative >= 1, (
        f"negatives must survive the fuse (checked={checked}, neg tiles={saw_negative})"
    )


def test_warp_signed_fuse_rejects_reserved_value(spark):
    regs = regions(spark)
    src = rasterize_rect_regions(regs, GRID_PAGES, res=RES_SRC).limit(1)
    src = src.withColumn(
        "raster",
        F.concat(F.array(F.lit(-(1 << 31))), F.slice("raster", 2, F.size("raster") - F.lit(1))),
    )
    cand = merc_region_tiles(regs, GRID_MERC)
    out = warp_rasters_to_grid(
        src, GRID_PAGES, RES_SRC, GRID_MERC, RES_DST, cand, "nearest", fuse="signed"
    )
    with pytest.raises(Exception, match="reserves INT32_MIN"):
        out.collect()


def test_sample_shuffle_mode_matches_broadcast(spark):
    """sample_merc_rasters(broadcast_rasters=False) — the planet-scale
    raster-table path — returns exactly the broadcast path's rows."""
    from datacube_core_spark.sources.pages import pages
    from datacube_core_spark.sources.regions import regions

    regs = regions(spark)
    src = rasterize_rect_regions(regs, GRID_PAGES, res=RES_SRC)
    cand = merc_region_tiles(regs, GRID_MERC)
    src = warp_rasters_to_grid(src, GRID_PAGES, RES_SRC, GRID_MERC, RES_DST, cand, "nearest")
    p = pages(spark, "/root/testdata/sf0.001").where(
        (F.col("lat") > -85.0) & (F.col("lat") < 85.0)
    ).limit(400)
    a = sample_merc_rasters(p, src, GRID_MERC, RES_DST).select("doc_id", "region_id", "value")
    b = sample_merc_rasters(p, src, GRID_MERC, RES_DST, broadcast_rasters=False).select(
        "doc_id", "region_id", "value"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
