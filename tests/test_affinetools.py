"""Affine-analysis utilities (geom/affinetools.py vs reference
datacube/utils/geometry/tools.py:186-361 semantics)."""

import math

import numpy as np
import pytest

from datacube_core_spark.geom.affine import Affine
from datacube_core_spark.geom.affinetools import (
    affine_from_pts,
    apply_affine,
    decompose_rws,
    get_scale_at_point,
    get_scale_from_linear_transform,
    split_translation,
)


def _mk_rot(theta_deg):
    t = math.radians(theta_deg)
    return np.array([[math.cos(t), -math.sin(t)], [math.sin(t), math.cos(t)]])


def test_apply_affine_shapes():
    a = Affine(2.0, 0.0, 10.0, 0.0, -3.0, 5.0)
    x = np.arange(6, dtype=np.float64).reshape(2, 3)
    y = np.ones((2, 3))
    ox, oy = apply_affine(a, x, y)
    assert ox.shape == (2, 3) and oy.shape == (2, 3)
    np.testing.assert_allclose(ox, 2.0 * x + 10.0)
    np.testing.assert_allclose(oy, -3.0 * y + 5.0)


def test_split_translation_vectors():
    # reference docstring contract: subpixel in [-0.5, +0.5], exact sum
    cases = [(1.3, -4.2), (0.5, -0.5), (10.0, 0.0), (2.7, -0.6), (-1.9, 3.51)]
    for t in cases:
        whole, sub = split_translation(t)
        for w, s, v in zip(whole, sub, t):
            assert w + s == pytest.approx(v, abs=1e-12)
            assert -0.5 <= s <= 0.5
            assert w == round(w)
    assert split_translation((1.3, -4.2))[0] == (1.0, -4.0)


@pytest.mark.parametrize("theta,shear,sx,sy", [
    (0, 0.0, 1.0, 1.0),
    (30, 0.3, 2.0, 0.5),
    (-75, -1.2, 5.0, 3.0),
    (120, 0.0, 1.0, 7.0),
])
def test_decompose_rws_roundtrip(theta, shear, sx, sy):
    r0 = _mk_rot(theta)
    w0 = np.array([[1.0, shear], [0.0, 1.0]])
    s0 = np.diag([sx, sy])
    a = r0 @ w0 @ s0
    r, w, s = decompose_rws(a)
    # R orthogonal with det +1, W unit-diagonal upper shear, S diagonal
    np.testing.assert_allclose(r @ r.T, np.eye(2), atol=1e-12)
    assert np.linalg.det(r) == pytest.approx(1.0)
    assert w[0, 0] == pytest.approx(1.0) and w[1, 1] == pytest.approx(1.0)
    assert abs(w[1, 0]) < 1e-12
    assert abs(s[0, 1]) < 1e-12 and abs(s[1, 0]) < 1e-12
    np.testing.assert_allclose(r @ w @ s, a, atol=1e-10)
    # recovers the planted factors (positive scales)
    np.testing.assert_allclose(r, r0, atol=1e-10)
    np.testing.assert_allclose(np.diag(s), [sx, sy], atol=1e-10)


def test_decompose_rws_affine_form_and_negative_det():
    a = Affine(1.0, 0.2, 7.0, 0.1, -2.0, -3.0)  # negative det (flip)
    r, w, s = decompose_rws(a)
    # translation rides on R; reconstruction holds
    assert (r.c, r.f) == (7.0, -3.0)
    m = np.array([[r.a, r.b], [r.d, r.e]]) @ np.array([[w.a, w.b], [w.d, w.e]]) @ np.array([[s.a, s.b], [s.d, s.e]])
    np.testing.assert_allclose(m, [[1.0, 0.2], [0.1, -2.0]], atol=1e-10)
    rm = np.array([[r.a, r.b], [r.d, r.e]])
    assert np.linalg.det(rm) == pytest.approx(1.0)  # flip absorbed into S


def test_affine_from_pts_recovers_exact():
    a = Affine(1.5, -0.25, 30.0, 0.75, 2.0, -11.0)
    xs = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (3.0, -2.0), (5.5, 4.25)]
    ys = [(a.a * x + a.b * y + a.c, a.d * x + a.e * y + a.f) for x, y in xs]
    got = affine_from_pts(xs, ys)
    for attr in "abcdef":
        assert getattr(got, attr) == pytest.approx(getattr(a, attr), abs=1e-9)
    with pytest.raises(AssertionError):
        affine_from_pts(xs[:2], ys[:2])  # needs >= 3 points


def test_get_scale_from_linear_transform_positive():
    a = Affine(-2.0, 0.0, 0.0, 0.0, 3.0, 0.0)
    sx, sy = get_scale_from_linear_transform(a)
    assert (sx, sy) == (pytest.approx(2.0), pytest.approx(3.0))


def test_get_scale_at_point_mercator_analytic():
    """Tie-in with the CRS seam: the Web-Mercator local scale at latitude
    φ is R·(π/180)/cos(φ) per degree on BOTH axes — the five-point
    linearization must recover it."""
    from datacube_core_spark.geom.mercator import get_transformer

    fwd = get_transformer("EPSG:4326", "EPSG:3857")

    def tr(pts):
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        ox, oy = fwd(xs, ys)
        return list(zip(ox.tolist(), oy.tolist()))

    R = 6378137.0
    for lat in (0.0, 30.0, 60.0):
        sx, sy = get_scale_at_point((10.0, lat), tr, r=0.01)
        exp_x = R * math.pi / 180.0
        exp_y = R * math.pi / 180.0 / math.cos(math.radians(lat))
        assert sx == pytest.approx(exp_x, rel=1e-4)
        assert sy == pytest.approx(exp_y, rel=1e-3)


def test_local_back_scale_agrees_with_get_scale_at_point():
    """reproject._local_back_scale (cheap 3-point finite difference used
    inside compute_reproject_roi) must agree with the full five-point
    LSQ linearization on a smooth cross-CRS pixel map."""
    from datacube_core_spark.geom.grid import GeoBox
    from datacube_core_spark.geom.reproject import (
        _local_back_scale,
        _pix_point_transforms,
    )

    src = GeoBox(
        200, 200, Affine.translation(0.0, 20.0) * Affine.scale(0.1, -0.1), "EPSG:4326"
    )
    dst = GeoBox(
        220, 230,
        Affine.translation(0.0, 2_300_000.0) * Affine.scale(10_000.0, -10_000.0),
        "EPSG:3857",
    )
    back, _fwd = _pix_point_transforms(src, dst)
    center = np.array([dst.width / 2.0, dst.height / 2.0])
    sx_fd, sy_fd = _local_back_scale(back, center)

    def tr(pts):
        out = back(np.asarray(pts, dtype=np.float64))
        return [tuple(p) for p in out]

    sx_ls, sy_ls = get_scale_at_point(tuple(center), tr, r=0.5)
    assert sx_fd == pytest.approx(sx_ls, rel=1e-3)
    assert sy_fd == pytest.approx(sy_ls, rel=1e-3)
