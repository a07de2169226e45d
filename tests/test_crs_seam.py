"""Pluggable CRS-transformer seam: the registry must make every consumer
(to_crs, the warp kernel, the DISTRIBUTED warp operator) work on a second,
non-mercator projection — the spherical sinusoidal (ESRI:54008-style) —
without any code change outside the registry (reference surface:
``datacube/utils/geometry/_base.py:305-346,679-715``, ``_warp.py:37-169``).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom.affine import Affine
from datacube_core_spark.geom.grid import GRID_PAGES, GeoBox, GridSpec
from datacube_core_spark.geom.mercator import (
    ESRI_54008,
    R_SINU,
    get_transformer,
    lonlat_to_sinu,
    register_transform,
    sinu_to_lonlat,
)
from datacube_core_spark.geom.warp import reproject

RES_SRC = 1.0
RES_DST = 256_000.0
GRID_SINU = GridSpec(
    ESRI_54008,
    tile_size=(2_048_000.0, 2_048_000.0),
    resolution=(-RES_DST, RES_DST),
    # y=0 / x=0 sit mid-pixel (same libm-boundary discipline as GRID_MERC)
    origin=(-10_864_000.0, -20_864_000.0),
)


def test_sinusoidal_roundtrip_and_registry():
    lon = np.array([-170.0, -45.5, 0.25, 91.0, 179.0])
    lat = np.array([-80.0, -10.0, 0.5, 45.0, 82.0])
    x, y = lonlat_to_sinu(lon, lat)
    lon2, lat2 = sinu_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # registry resolves both directions
    assert get_transformer("EPSG:4326", ESRI_54008) is lonlat_to_sinu
    assert get_transformer(ESRI_54008, "EPSG:4326") is sinu_to_lonlat


def test_composed_transform_through_4326_pivot():
    """3857 -> 54008 has no direct registration: the seam composes
    3857->4326->54008 automatically."""
    t = get_transformer("EPSG:3857", ESRI_54008)
    from datacube_core_spark.geom.mercator import lonlat_to_merc

    lon = np.array([-120.0, 3.0, 77.0])
    lat = np.array([-33.0, 12.0, 64.0])
    mx, my = lonlat_to_merc(lon, lat)
    gx, gy = t(mx, my)
    ex, ey = lonlat_to_sinu(lon, lat)
    np.testing.assert_allclose(gx, ex, rtol=1e-12)
    np.testing.assert_allclose(gy, ey, rtol=1e-12)


def test_unregistered_pair_raises_with_guidance():
    with pytest.raises(NotImplementedError, match="register_transform"):
        get_transformer("EPSG:32633", "EPSG:27700")


def test_register_transform_extends_seam():
    """A user-registered closed-form pair lights up get_transformer."""
    fwd = lambda xs, ys: (np.asarray(xs) * 2.0, np.asarray(ys) * 2.0)
    inv = lambda xs, ys: (np.asarray(xs) / 2.0, np.asarray(ys) / 2.0)
    register_transform("TEST:DOUBLE", "EPSG:4326", inv, fwd)
    t = get_transformer("EPSG:4326", "TEST:DOUBLE")
    x, y = t(np.array([1.0]), np.array([3.0]))
    assert float(x[0]) == 2.0 and float(y[0]) == 6.0
    # and the pivot composition now reaches it from 3857
    t2 = get_transformer("EPSG:3857", "TEST:DOUBLE")
    from datacube_core_spark.geom.mercator import lonlat_to_merc

    mx, my = lonlat_to_merc(np.array([10.0]), np.array([20.0]))
    gx, gy = t2(mx, my)
    np.testing.assert_allclose([float(gx[0]), float(gy[0])], [20.0, 40.0], atol=1e-9)


def test_to_crs_multipolygon_sinusoidal():
    from datacube_core_spark.geom.ops import to_crs_multipolygon
    from datacube_core_spark.geom.polygon import box_ring

    mp = [[box_ring(10.0, 20.0, 30.0, 45.0)]]
    out = to_crs_multipolygon(mp, "EPSG:4326", ESRI_54008, resolution=float("inf"))
    got = out[0][0]
    ex, ey = lonlat_to_sinu(np.asarray([10.0, 30.0, 30.0, 10.0]), np.asarray([20.0, 20.0, 45.0, 45.0]))
    np.testing.assert_allclose(sorted(got[:, 0]), sorted(ex), rtol=1e-12)
    np.testing.assert_allclose(sorted(got[:, 1]), sorted(ey), rtol=1e-12)


# ---------------------------------------------------------------------------
# distributed warp on the sinusoidal grid — end-to-end seam proof
# ---------------------------------------------------------------------------

def _sinu_region_tiles(spark, regs_rows):
    """Candidate (dst_tx, dst_ty, region_id) on GRID_SINU: project region
    bbox corners + the y=0 midline (where sinusoidal |x| peaks), floor to
    tiles."""
    sy, sx = GRID_SINU.tile_size
    oy, ox = GRID_SINU.origin
    rows = []
    for rid, l, b, r, t in regs_rows:
        lats = [b, t] + ([0.0] if b < 0.0 < t else [])
        xs, ys = [], []
        for la in lats:
            x2, y2 = lonlat_to_sinu(np.array([l, r]), np.array([la, la]))
            xs += [float(x2[0]), float(x2[1])]
            ys.append(float(y2[0]))
        tx0 = int(np.floor((min(xs) - ox) / abs(sx)))
        tx1 = int(np.ceil((max(xs) - ox) / abs(sx))) - 1
        ty0 = int(np.floor((min(ys) - oy) / abs(sy)))
        ty1 = int(np.ceil((max(ys) - oy) / abs(sy))) - 1
        for tx in range(tx0, max(tx1, tx0) + 1):
            for ty in range(ty0, max(ty1, ty0) + 1):
                rows.append((tx, ty, rid))
    return spark.createDataFrame(rows, "dst_tx INT, dst_ty INT, region_id INT")


def _local_sinu_tile(dst_tx, dst_ty, bounds):
    l, b, r, t = bounds
    w, h = 360, 180
    s_gbox = GeoBox(w, h, Affine(1.0, 0.0, -180.0, 0.0, -1.0, 90.0), "EPSG:4326")
    xs = -180.0 + (np.arange(w) + 0.5)
    ys = 90.0 - (np.arange(h) + 0.5)
    XX, YY = np.meshgrid(xs, ys)
    src = ((XX > l) & (XX < r) & (YY > b) & (YY < t)).astype(np.int32)

    d_sx = abs(GRID_SINU.tile_size[1])
    d_left = dst_tx * d_sx + GRID_SINU.origin[1]
    d_top = (dst_ty + 1) * abs(GRID_SINU.tile_size[0]) + GRID_SINU.origin[0]
    npx = int(round(d_sx / RES_DST))
    d_gbox = GeoBox(npx, npx, Affine(RES_DST, 0.0, d_left, 0.0, -RES_DST, d_top), ESRI_54008)
    dst = np.full((npx, npx), -1, dtype=np.int32)
    reproject(src, dst, s_gbox, d_gbox, "nearest", dst_nodata=-1)
    return np.maximum(dst, 0)


def test_distributed_warp_sinusoidal_matches_single_machine(spark):
    from datacube_core_spark.operators.raster import rasterize_rect_regions
    from datacube_core_spark.operators.warp import warp_rasters_to_grid
    from datacube_core_spark.sources.regions import region_bounds, regions

    regs = regions(spark)
    sample_rids = [0, 37, 120, 239]
    regs_rows = [(rid, *region_bounds(rid)) for rid in sample_rids]
    regs_small = regs.where(F.col("region_id").isin(sample_rids))
    src = rasterize_rect_regions(regs_small, GRID_PAGES, res=RES_SRC)
    cand = _sinu_region_tiles(spark, regs_rows)

    out = warp_rasters_to_grid(src, GRID_PAGES, RES_SRC, GRID_SINU, RES_DST, cand, "nearest")
    rows = out.collect()
    assert rows
    npx = int(round(abs(GRID_SINU.tile_size[1]) / RES_DST))
    bounds = {rid: bd for rid, *bd in regs_rows}
    checked = nonzero = 0
    for r in rows[:60]:
        exp = _local_sinu_tile(int(r["dst_tx"]), int(r["dst_ty"]), bounds[int(r["region_id"])])
        got = np.array(r["raster"], dtype=np.int32).reshape(npx, npx)
        np.testing.assert_array_equal(
            got, exp, err_msg=str((r["dst_tx"], r["dst_ty"], r["region_id"]))
        )
        checked += 1
        if exp.any():
            nonzero += 1
    assert checked >= 10 and nonzero >= 4  # the comparison is not vacuous


def test_warp_rejects_non_geographic_src():
    from datacube_core_spark.operators.warp import warp_rasters_to_grid

    with pytest.raises(NotImplementedError, match="src grid"):
        warp_rasters_to_grid(None, GRID_SINU, RES_DST, GRID_SINU, RES_DST, None, "nearest")
