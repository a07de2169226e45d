"""Warp kernel golden vectors + properties.

Scenario shapes mirror the reference's tests (``tests/test_warp.py:40-120``:
block translation, nodata fill; ``tests/storage/test_storage_read.py``:
paste/reproject equivalences), recomputed for our documented semantics.
"""

import numpy as np
import pytest

from datacube_core_spark.geom.affine import Affine
from datacube_core_spark.geom.grid import GeoBox
from datacube_core_spark.geom.mercator import (
    MAX_LAT,
    get_transformer,
    lonlat_to_merc,
    merc_to_lonlat,
)
from datacube_core_spark.geom.warp import is_resampling_nn, reproject, warp_affine


def _src_block():
    src = np.zeros((128, 256), dtype="int16")
    src[10:20, 30:50] = 33
    return src


def test_is_resampling_nn():
    assert is_resampling_nn("nearest") and is_resampling_nn("Nearest")
    assert not is_resampling_nn("average")


def test_warp_translation_matches_reference_vectors():
    # the reference's test_warp block-translation vectors (test_warp.py:40-60)
    src = _src_block()
    dst = np.zeros_like(src)
    out = warp_affine(src, dst, Affine.translation(+30, +10), resampling="nearest")
    assert out is dst
    assert (dst[:10, :20] == 33).all()
    assert (dst[10:, :] == 0).all()
    assert (dst[:, 20:] == 0).all()


def test_warp_translation_nodata_fill():
    # reference test_warp.py:62-73: out-of-src pixels take dst_nodata
    src = _src_block().astype("int8")
    dst = np.zeros_like(src)
    warp_affine(src, dst, Affine.translation(+30, +10), "nearest", src_nodata=0, dst_nodata=-3)
    assert (dst[:10, :20] == 33).all()
    assert (dst[10:, :] == -3).all()
    assert (dst[:, 20:] == -3).all()


def test_warp_identity_all_modes():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 100, size=(32, 48)).astype("float64")
    for mode in ("nearest", "bilinear", "average"):
        dst = np.zeros_like(src)
        warp_affine(src, dst, Affine.identity(), mode)
        np.testing.assert_allclose(dst, src, err_msg=mode)


def test_warp_bilinear_halfpixel_shift():
    # shifting by half a pixel averages adjacent columns
    src = np.array([[0.0, 10.0, 20.0, 30.0]] * 3)
    dst = np.zeros_like(src)
    warp_affine(src, dst, Affine.translation(0.5, 0.0), "bilinear")
    np.testing.assert_allclose(dst[:, :3], [[5.0, 15.0, 25.0]] * 3)


def test_warp_bilinear_nodata_renormalizes():
    src = np.array([[1.0, -1.0], [1.0, 1.0]])
    dst = np.zeros((2, 2))
    # sample exactly between the 4 centers: weights equal; the -1 hole is
    # excluded and the rest renormalized -> 1.0
    warp_affine(src, dst, Affine.translation(0.5, 0.5), "bilinear", src_nodata=-1.0, dst_nodata=-9.0)
    assert dst[0, 0] == 1.0


def test_warp_average_integer_decimation():
    # 2x downscale: average of each 2x2 block of src pixel centers
    src = np.arange(16, dtype="float64").reshape(4, 4)
    dst = np.zeros((2, 2))
    warp_affine(src, dst, Affine.scale(2.0, 2.0), "average")
    exp = np.array([[src[:2, :2].mean(), src[:2, 2:].mean()], [src[2:, :2].mean(), src[2:, 2:].mean()]])
    np.testing.assert_allclose(dst, exp)


def test_warp_average_nodata_excluded():
    src = np.array([[4.0, -1.0], [-1.0, -1.0]])
    dst = np.zeros((1, 1))
    warp_affine(src, dst, Affine.scale(2.0, 2.0), "average", src_nodata=-1.0, dst_nodata=-9.0)
    assert dst[0, 0] == 4.0  # the single valid pixel


def test_warp_average_upscale_falls_back_to_nearest():
    src = np.array([[1.0, 2.0], [3.0, 4.0]])
    dst = np.zeros((4, 4))
    warp_affine(src, dst, Affine.scale(0.5, 0.5), "average")
    exp = np.repeat(np.repeat(src, 2, axis=0), 2, axis=1)
    np.testing.assert_allclose(dst, exp)


def test_warp_bad_mode_raises():
    with pytest.raises(ValueError, match="Bad resampling"):
        warp_affine(np.zeros((2, 2)), np.zeros((2, 2)), Affine.identity(), "no_such_mode")


# ---------------------------------------------------------------------------
# mercator transform + cross-CRS reproject
# ---------------------------------------------------------------------------

def test_mercator_roundtrip_and_anchors():
    lon = np.linspace(-179.9, 179.9, 41)
    lat = np.linspace(-MAX_LAT, MAX_LAT, 41)
    x, y = lonlat_to_merc(lon, lat)
    lon2, lat2 = merc_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # anchors: (0,0) -> (0,0); x linear in lon
    x0, y0 = lonlat_to_merc(0.0, 0.0)
    assert x0 == 0.0 and abs(y0) < 1e-9
    x1, _ = lonlat_to_merc(180.0, 0.0)
    np.testing.assert_allclose(x1, 20037508.342789244)


def test_transformer_registry():
    t = get_transformer("EPSG:4326", "EPSG:4326")
    xs, ys = t(np.array([1.0]), np.array([2.0]))
    assert xs[0] == 1.0 and ys[0] == 2.0
    # UTM zones resolve natively since r5 (geom/tmerc.py lazy registry)
    utm = get_transformer("EPSG:4326", "EPSG:32633")
    x, y = utm(np.array([15.0]), np.array([0.0]))
    assert abs(x[0] - 500000.0) < 1e-6 and abs(y[0]) < 1e-9
    # a genuinely unregistered CRS (British National Grid) still raises
    with pytest.raises(NotImplementedError):
        get_transformer("EPSG:4326", "EPSG:27700")


def _gbox_4326(left, top, res, w, h):
    return GeoBox(w, h, Affine(res, 0.0, left, 0.0, -res, top), "EPSG:4326")


def _gbox_3857(left, top, res, w, h):
    return GeoBox(w, h, Affine(res, 0.0, left, 0.0, -res, top), "EPSG:3857")


def test_cross_crs_nearest_vs_pointwise_oracle():
    """Every dst pixel of a 4326→3857 nearest warp must equal the src
    pixel containing its back-projected center (independent pointwise
    recompute)."""
    rng = np.random.default_rng(7)
    src = rng.integers(0, 90, size=(40, 80)).astype("int32")
    s_gbox = _gbox_4326(-20.0, 30.0, 0.5, 80, 40)  # covers lon -20..20, lat 10..30
    x0, y1 = lonlat_to_merc(-20.0, 30.0)
    x1, y0 = lonlat_to_merc(20.0, 10.0)
    dw, dh = 64, 32
    res_x = (x1 - x0) / dw
    d_gbox = _gbox_3857(float(x0), float(y1), float(res_x), dw, dh)
    # non-square dst pixels: adjust y scale
    res_y = (float(y1) - float(y0)) / dh
    d_gbox = GeoBox(dw, dh, Affine(res_x, 0.0, float(x0), 0.0, -res_y, float(y1)), "EPSG:3857")

    dst = np.full((dh, dw), -1, dtype="int32")
    reproject(src, dst, s_gbox, d_gbox, "nearest", dst_nodata=-1)

    for j in (0, 7, 15, 31):
        for i in (0, 9, 33, 63):
            cx = float(x0) + (i + 0.5) * res_x
            cy = float(y1) - (j + 0.5) * res_y
            lon, lat = merc_to_lonlat(cx, cy)
            px = int(np.floor((lon - (-20.0)) / 0.5))
            py = int(np.floor((30.0 - lat) / 0.5))
            exp = src[py, px] if 0 <= px < 80 and 0 <= py < 40 else -1
            assert dst[j, i] == exp, (j, i)


def test_cross_crs_constant_field_invariance():
    """A constant image stays constant under any mode (where defined)."""
    src = np.full((30, 60), 7.0)
    s_gbox = _gbox_4326(-30.0, 30.0, 1.0, 60, 30)
    x0, y1 = lonlat_to_merc(-30.0, 30.0)
    x1, y0 = lonlat_to_merc(30.0, 0.0)
    d_gbox = GeoBox(
        32, 16,
        Affine((float(x1) - float(x0)) / 32, 0.0, float(x0), 0.0, -(float(y1) - float(y0)) / 16, float(y1)),
        "EPSG:3857",
    )
    for mode in ("nearest", "bilinear", "average"):
        dst = np.full((16, 32), np.nan)
        reproject(src, dst, s_gbox, d_gbox, mode, dst_nodata=np.nan)
        assert np.nanmax(np.abs(dst - 7.0)) < 1e-12, mode
        assert np.isfinite(dst).all(), mode


def test_to_crs_multipolygon_roundtrip_and_segmentize():
    from datacube_core_spark.geom.ops import to_crs_multipolygon
    from datacube_core_spark.geom.polygon import box_ring

    mp = [[box_ring(-30.0, -20.0, 40.0, 50.0)]]
    out = to_crs_multipolygon(mp, "EPSG:4326", "EPSG:3857")
    ring = out[0][0]
    # default 1-degree segmentize: the 70-degree edge gains >= 69 vertices
    assert len(ring) >= 4 + 69 * 2
    # corner anchors exact through the transform
    x, y = lonlat_to_merc(np.array([-30.0]), np.array([-20.0]))
    assert np.isclose(ring[:, 0].min(), x[0]) and np.isclose(ring[:, 1].min(), y[0])
    # round-trip back to 4326 recovers the corners
    back = to_crs_multipolygon(out, "EPSG:3857", "EPSG:4326", resolution=float("inf"))
    r2 = back[0][0]
    assert np.isclose(r2[:, 0].min(), -30.0, atol=1e-9)
    assert np.isclose(r2[:, 1].max(), 50.0, atol=1e-9)


def test_compute_reproject_roi_cross_crs():
    from datacube_core_spark.geom.reproject import can_paste, compute_reproject_roi

    # src: whole-world-ish 4326 plane at 1 deg; dst: a merc window over Europe
    s_gbox = _gbox_4326(-180.0, 85.0, 1.0, 360, 170)
    x0, y1 = lonlat_to_merc(0.0, 60.0)
    x1, y0 = lonlat_to_merc(30.0, 40.0)
    d_gbox = GeoBox(
        60, 40,
        Affine((float(x1) - float(x0)) / 60, 0.0, float(x0), 0.0, -(float(y1) - float(y0)) / 40, float(y1)),
        "EPSG:3857",
    )
    rr = compute_reproject_roi(s_gbox, d_gbox)
    assert rr.is_st is False
    ok, reason = can_paste(rr)
    assert not ok and reason == "not ST"
    # src ROI must cover lon 0..30 (cols 180..210), lat 40..60 (rows 25..45),
    # padded by 1
    assert rr.roi_src[1].start <= 180 and rr.roi_src[1].stop >= 210
    assert rr.roi_src[0].start <= 25 and rr.roi_src[0].stop >= 45
    # and not be wildly larger
    assert rr.roi_src[1].stop - rr.roi_src[1].start <= 34
    assert rr.roi_src[0].stop - rr.roi_src[0].start <= 24
    # dst ROI is the whole dst window
    assert rr.roi_dst == (slice(0, 40), slice(0, 60))
    # shrink scale ~ (1 deg src pixels per dst pixel): dst is 60 px over 30 deg
    assert 0.3 < rr.scale < 0.7

    # UTM is a REGISTERED pair since r5 (geom/tmerc.py): a UTM source
    # geobox plans a cross-CRS ROI instead of raising.  100km-square
    # window near zone 33's central meridian back-projects into the
    # 4326 dst plane without error.
    g_utm = GeoBox(
        10, 10, Affine(100.0, 0.0, 500000.0, 0.0, -100.0, 5000000.0), "EPSG:32633"
    )
    rr_utm = compute_reproject_roi(g_utm, d_gbox)
    # the 1km UTM window lands somewhere inside the dst plane: a small,
    # non-degenerate dst ROI (exact indices depend on the dst grid)
    assert rr_utm.roi_dst[0].stop > rr_utm.roi_dst[0].start >= 0
    assert rr_utm.roi_dst[1].stop > rr_utm.roi_dst[1].start >= 0

    # a genuinely unregistered CRS still raises the documented block
    g_bng = GeoBox(10, 10, Affine(100.0, 0.0, 0.0, 0.0, -100.0, 0.0), "EPSG:27700")
    with pytest.raises(NotImplementedError):
        compute_reproject_roi(g_bng, d_gbox)


def test_all_13_modes_constant_field():
    """Every GDAL-list mode (api/core.py:335-338) is implemented and maps
    a constant field to the same constant (weights normalize)."""
    from datacube_core_spark.geom.warp import RESAMPLING_MODES

    assert len(RESAMPLING_MODES) == 13
    src = np.full((20, 30), 5.0)
    for mode in RESAMPLING_MODES:
        dst = np.full((10, 15), np.nan)
        warp_affine(src, dst, Affine.scale(2.0, 2.0), mode, dst_nodata=np.nan)
        assert np.isfinite(dst).all(), mode
        np.testing.assert_allclose(dst, 5.0, atol=1e-9, err_msg=mode)


def test_interpolating_kernels_identity():
    """cubic and lanczos interpolate: identity transform reproduces src
    exactly (kernel is a delta at integer offsets); cubic_spline and
    gauss smooth, so only approximately."""
    rng = np.random.default_rng(12)
    src = rng.uniform(0, 100, size=(24, 36))
    for mode in ("cubic", "lanczos"):
        dst = np.zeros_like(src)
        warp_affine(src, dst, Affine.identity(), mode)
        np.testing.assert_allclose(dst, src, atol=1e-9, err_msg=mode)
    for mode in ("cubic_spline", "gauss"):
        dst = np.zeros_like(src)
        warp_affine(src, dst, Affine.identity(), mode)
        # smoothing: close in the mean, not exact
        assert abs(dst.mean() - src.mean()) < 2.0, mode
        assert not np.allclose(dst, src), mode


def test_bucket_stats_2x_downscale():
    """min/max/med/q1/q3/mode on a 2x downscale equal the per-2x2-block
    statistics (documented order-statistic semantics)."""
    rng = np.random.default_rng(4)
    src = rng.integers(0, 50, size=(8, 8)).astype("float64")
    blocks = src.reshape(4, 2, 4, 2).transpose(0, 2, 1, 3).reshape(4, 4, 4)
    sorted_b = np.sort(blocks, axis=2)
    exp = {
        "min": sorted_b[:, :, 0],
        "max": sorted_b[:, :, 3],
        "q1": sorted_b[:, :, (4 - 1) * 1 // 4],
        "med": sorted_b[:, :, (4 - 1) * 2 // 4],
        "q3": sorted_b[:, :, (4 - 1) * 3 // 4],
    }
    for mode, e in exp.items():
        dst = np.zeros((4, 4))
        warp_affine(src, dst, Affine.scale(2.0, 2.0), mode)
        np.testing.assert_array_equal(dst, e, err_msg=mode)

    # mode: plant a clear majority in each block
    src2 = np.array([[7, 7, 1, 2], [7, 3, 1, 1], [9, 9, 4, 5], [9, 8, 4, 4]], dtype="float64")
    dst2 = np.zeros((2, 2))
    warp_affine(src2, dst2, Affine.scale(2.0, 2.0), "mode")
    np.testing.assert_array_equal(dst2, [[7, 1], [9, 4]])
    # tie in a block -> smallest value wins (documented rule)
    src3 = np.array([[1, 2], [2, 1]], dtype="float64")
    dst3 = np.zeros((1, 1))
    warp_affine(src3, dst3, Affine.scale(2.0, 2.0), "mode")
    assert dst3[0, 0] == 1.0


def test_bucket_stats_nodata_excluded():
    src = np.array([[5.0, -1.0], [9.0, -1.0]])
    for mode, e in (("min", 5.0), ("max", 9.0), ("med", 5.0)):
        dst = np.zeros((1, 1))
        warp_affine(src, dst, Affine.scale(2.0, 2.0), mode, src_nodata=-1.0, dst_nodata=-9.0)
        assert dst[0, 0] == e, mode


def test_cubic_halfpixel_shift_matches_keys_kernel():
    """Cubic at a half-pixel offset = Keys weights (-1/16, 9/16, 9/16, -1/16)."""
    src = np.zeros((3, 8))
    src[:, 3] = 16.0
    dst = np.zeros_like(src)
    warp_affine(src, dst, Affine.translation(0.5, 0.0), "cubic")
    # dst col j samples src at j+1 centers offset .5: cols 1,2 get 9/16*16=9, cols 0,3 get -1
    assert dst[1, 2] == pytest.approx(9.0)
    assert dst[1, 3] == pytest.approx(9.0)
    assert dst[1, 1] == pytest.approx(-1.0)
    assert dst[1, 4] == pytest.approx(-1.0)
