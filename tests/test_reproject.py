"""Reproject-planning tests: overlap invariants and paste golden cases
mirroring the reference's test_geometry.py compute_reproject_roi checks."""

import numpy as np
import pytest

from datacube_core_spark.geom import Affine, GeoBox
from datacube_core_spark.geom.mathx import roi_shape
from datacube_core_spark.geom.reproject import (
    box_overlap,
    can_paste,
    compute_axis_overlap,
    compute_reproject_roi,
    paste,
    pick_read_scale,
)


def _gb(x0, y0, w, h, res=0.1, crs="C"):
    return GeoBox(w, h, Affine.translation(x0, y0) * Affine.scale(res, -res), crs)


def test_identity_roi():
    a = _gb(10, 20, 100, 80)
    rr = compute_reproject_roi(a, a)
    assert rr.is_st
    assert rr.roi_src == (slice(0, 80), slice(0, 100))
    assert rr.roi_dst == (slice(0, 80), slice(0, 100))
    assert rr.scale == pytest.approx(1.0)
    assert can_paste(rr) == (True, None)


def test_shifted_overlap():
    a = _gb(10, 20, 100, 80)
    b = _gb(10 + 0.1 * 50, 20 - 0.1 * 30, 100, 80)  # 50 px right, 30 px down
    rr = compute_reproject_roi(a, b)
    assert roi_shape(rr.roi_src) == (50, 50)
    assert rr.roi_src == (slice(30, 80), slice(50, 100))
    assert rr.roi_dst == (slice(0, 50), slice(0, 50))
    assert can_paste(rr) == (True, None)


def test_disjoint_is_empty():
    a = _gb(10, 20, 100, 80)
    b = _gb(1000, 2000, 10, 10)
    rr = compute_reproject_roi(a, b)
    assert roi_shape(rr.roi_src)[0] == 0 or roi_shape(rr.roi_src)[1] == 0


def test_scale_2_paste():
    a = _gb(0, 10, 100, 100, res=0.1)
    b = _gb(0, 10, 50, 50, res=0.2)  # same extent, half the pixels
    rr = compute_reproject_roi(a, b)
    assert rr.scale == pytest.approx(2.0)
    assert can_paste(rr) == (True, None)
    assert pick_read_scale(rr.scale) == 2

    src = np.arange(10000, dtype=np.float64).reshape(100, 100)
    dst = np.full((50, 50), -1.0)
    paste(src, dst, rr)
    assert dst[0, 0] == src[0, 0]
    assert dst[1, 2] == src[2, 4]


def test_subpixel_translation_rejected():
    a = _gb(0, 10, 100, 100, res=0.1)
    b = _gb(0.05, 10, 100, 100, res=0.1)  # half-pixel shift
    rr = compute_reproject_roi(a, b)
    ok, reason = can_paste(rr)
    assert not ok and reason == "sub-pixel translation"


def test_non_integer_scale_rejected():
    a = _gb(0, 10, 100, 100, res=0.1)
    b = _gb(0, 10, 40, 40, res=0.25)
    rr = compute_reproject_roi(a, b)
    ok, reason = can_paste(rr)
    assert not ok and reason == "non-integer scale"


def test_cross_crs_raises():
    a = _gb(0, 10, 10, 10, crs="A")
    b = _gb(0, 10, 10, 10, crs="B")
    with pytest.raises(NotImplementedError):
        compute_reproject_roi(a, b)


def test_axis_overlap_flip():
    # negative scale: dst is flipped relative to src
    s, d = compute_axis_overlap(10, 10, -1.0, 10.0)
    assert s == slice(0, 10) and d == slice(0, 10)


def test_box_overlap_snapping():
    # tiny float jitter in scale/translation must snap away
    st = Affine(1.0000000001, 0, 5.0000001, 0, 1.0, 3.0)
    (s0, s1), (d0, d1) = box_overlap((20, 20), (20, 20), st, tol=1e-3)
    assert s1 == slice(5, 20) and d1 == slice(0, 15)
    assert s0 == slice(3, 20) and d0 == slice(0, 17)


def test_paste_roundtrip_full():
    a = _gb(0, 10, 64, 64)
    src = np.random.default_rng(1).integers(0, 255, (64, 64)).astype(np.float64)
    dst = np.zeros_like(src)
    rr = compute_reproject_roi(a, a)
    paste(src, dst, rr)
    np.testing.assert_array_equal(src, dst)


def test_rotated_linear_path():
    from datacube_core_spark.geom.reproject import get_scale_from_linear_transform
    import math as m

    # dst rotated 30° relative to src, same pixel size
    th = m.radians(30)
    rot = Affine(m.cos(th), -m.sin(th), 5.0, m.sin(th), m.cos(th), 3.0)
    src = GeoBox(100, 80, Affine.translation(0, 0) * Affine.scale(1.0, 1.0), "C")
    dst = GeoBox(50, 40, rot, "C")
    rr = compute_reproject_roi(src, dst)
    assert not rr.is_st
    ok, reason = can_paste(rr)
    assert not ok and reason == "not ST"
    # src ROI must cover the back-projected dst corners (+1 px padding)
    corners = [(0, 0), (50, 0), (0, 40), (50, 40)]
    for cx, cy in corners:
        x, y = rot * (cx, cy)
        if 0 <= x <= 100 and 0 <= y <= 80:
            assert rr.roi_src[1].start <= x <= rr.roi_src[1].stop
            assert rr.roi_src[0].start <= y <= rr.roi_src[0].stop
    # pure rotation: scale is 1 on both axes
    sx, sy = get_scale_from_linear_transform(rr.transform)
    assert sx == pytest.approx(1.0) and sy == pytest.approx(1.0)


def test_scale_decomposition_with_shear():
    from datacube_core_spark.geom.reproject import get_scale_from_linear_transform
    import math as m

    # M = R(20°) · W(shear 0.3) · S(2, 5) — decomposition must recover S
    th = m.radians(20)
    r = np.array([[m.cos(th), -m.sin(th)], [m.sin(th), m.cos(th)]])
    w = np.array([[1.0, 0.3], [0.0, 1.0]])
    s = np.diag([2.0, 5.0])
    mm = r @ w @ s
    a = Affine(mm[0, 0], mm[0, 1], 0, mm[1, 0], mm[1, 1], 0)
    sx, sy = get_scale_from_linear_transform(a)
    assert sx == pytest.approx(2.0)
    assert sy == pytest.approx(5.0)
