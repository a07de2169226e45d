"""Pure-numpy warp kernel: nearest / bilinear / average resampling.

The reference's pixel reprojection delegates to GDAL
(``datacube/utils/geometry/_warp.py:37-169`` — ``warp_affine`` /
``rio_reproject``; the 13 mode names at ``datacube/api/core.py:335-338``).
This module re-implements the three workhorse modes as original numpy
code with the same call shapes, composing with the already-ported read
planning (``geom/reproject.py``: ``compute_reproject_roi`` /
``can_paste`` / ``paste``) and the closed-form CRS transforms
(``geom/mercator.py``), so the cross-CRS load path runs end-to-end
without GDAL.

Semantics (documented; asserted by golden-vector tests):

* ``nearest``  — dst pixel takes the src pixel *containing* the dst pixel
  center's back-projection (floor of the continuous src pixel coord).
* ``bilinear`` — interpolation between the 4 src pixel centers around the
  back-projected dst center (edge-clamped).  With ``src_nodata``: invalid
  neighbours are excluded and the remaining weights renormalized; all-4
  invalid → ``dst_nodata``.
* ``average``  — mean of all valid src pixels whose centers forward-map
  into the dst pixel (the downscale workhorse).  Dst pixels receiving no
  src center (upscale) fall back to the nearest sample.  (GDAL computes
  an area-weighted average; center-in-cell is the standard simplification
  and converges to the same value as the shrink factor grows.)

Dst pixels whose back-projection falls outside the src plane get
``dst_nodata`` when given, else are left untouched (matches the
reference's tests, ``tests/test_warp.py:40-73``).

Transform convention matches the reference: ``A`` maps DST pixel coords
to SRC pixel coords.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import numpy as np

from .affine import Affine
from .grid import GeoBox
from .mercator import get_transformer

Nodata = Optional[Union[int, float]]

RESAMPLING_MODES = ("nearest", "bilinear", "average")


def is_resampling_nn(resampling: str) -> bool:
    """True iff the mode is nearest-neighbour (reference ``_warp.py:27``)."""
    return isinstance(resampling, str) and resampling.lower() == "nearest"


def _check_mode(resampling: str) -> str:
    r = resampling.lower()
    if r not in RESAMPLING_MODES:
        raise ValueError(
            f"Bad resampling parameter: {resampling} (implemented: {RESAMPLING_MODES}; "
            "the remaining GDAL modes are an environment-blocked surface, see ROADMAP)"
        )
    return r


def _valid(v: np.ndarray, nodata: Nodata) -> np.ndarray:
    if nodata is None:
        return np.ones(v.shape, dtype=bool)
    if isinstance(nodata, float) and np.isnan(nodata):
        return ~np.isnan(v)
    return v != nodata


def _dst_center_grid(shape: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    h, w = shape
    xx = np.arange(w, dtype=np.float64) + 0.5
    yy = np.arange(h, dtype=np.float64) + 0.5
    return np.meshgrid(xx, yy)


def _warp_gather(
    src: np.ndarray,
    dst: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    resampling: str,
    src_nodata: Nodata,
    dst_nodata: Nodata,
) -> np.ndarray:
    """Fill dst from src given the back-projected continuous src pixel
    coords (xs, ys) of every dst pixel center."""
    h, w = src.shape
    fill = dst_nodata

    if resampling == "nearest":
        ix = np.floor(xs).astype(np.int64)
        iy = np.floor(ys).astype(np.int64)
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & np.isfinite(xs) & np.isfinite(ys)
        vals = src[iy.clip(0, h - 1), ix.clip(0, w - 1)]
        if src_nodata is not None:
            ok &= _valid(vals, src_nodata)
        if fill is not None:
            dst[~ok] = fill
        dst[ok] = vals[ok]
        return dst

    # bilinear
    fx = xs - 0.5
    fy = ys - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx = fx - x0
    ty = fy - y0
    inside = (xs >= 0) & (xs <= w) & (ys >= 0) & (ys <= h) & np.isfinite(xs) & np.isfinite(ys)

    x0c = x0.clip(0, w - 1)
    x1c = (x0 + 1).clip(0, w - 1)
    y0c = y0.clip(0, h - 1)
    y1c = (y0 + 1).clip(0, h - 1)

    vs = [src[y0c, x0c], src[y0c, x1c], src[y1c, x0c], src[y1c, x1c]]
    ws = [(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty]

    if src_nodata is None:
        num = sum(v.astype(np.float64) * wgt for v, wgt in zip(vs, ws))
        den = np.ones_like(num)
        any_valid = inside
    else:
        num = np.zeros(xs.shape, dtype=np.float64)
        den = np.zeros(xs.shape, dtype=np.float64)
        for v, wgt in zip(vs, ws):
            m = _valid(v, src_nodata)
            num = num + np.where(m, v.astype(np.float64) * wgt, 0.0)
            den = den + np.where(m, wgt, 0.0)
        any_valid = inside & (den > 0)

    out = np.divide(num, den, out=np.zeros_like(num), where=den > 0)
    if np.issubdtype(dst.dtype, np.integer):
        out = np.rint(out)
    if fill is not None:
        dst[~any_valid] = fill
    dst[any_valid] = out[any_valid].astype(dst.dtype)
    return dst


def _warp_average(
    src: np.ndarray,
    dst: np.ndarray,
    fwd_pix: Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]],
    back_xs: np.ndarray,
    back_ys: np.ndarray,
    src_nodata: Nodata,
    dst_nodata: Nodata,
) -> np.ndarray:
    """Average mode: bucket src pixel centers into dst pixels (forward
    map), mean per bucket; empty dst pixels fall back to nearest via the
    provided back-projection."""
    sh, sw = src.shape
    dh, dw = dst.shape
    sxx, syy = _dst_center_grid((sh, sw))  # src pixel centers (pixel coords)
    dxs, dys = fwd_pix(sxx.ravel(), syy.ravel())
    jx = np.floor(dxs).astype(np.int64)
    jy = np.floor(dys).astype(np.int64)
    vals = src.ravel().astype(np.float64)
    ok = (jx >= 0) & (jx < dw) & (jy >= 0) & (jy < dh) & np.isfinite(dxs) & np.isfinite(dys)
    ok &= _valid(vals, src_nodata)

    sums = np.zeros((dh, dw), dtype=np.float64)
    cnts = np.zeros((dh, dw), dtype=np.int64)
    np.add.at(sums, (jy[ok], jx[ok]), vals[ok])
    np.add.at(cnts, (jy[ok], jx[ok]), 1)

    got = cnts > 0
    mean = np.divide(sums, cnts, out=np.zeros_like(sums), where=got)
    if np.issubdtype(dst.dtype, np.integer):
        mean = np.rint(mean)

    # empty dst pixels: nearest fallback
    nf = np.array(dst, copy=True)
    _warp_gather(src, nf, back_xs, back_ys, "nearest", src_nodata, dst_nodata)
    out = np.where(got, mean.astype(dst.dtype), nf)
    dst[...] = out
    return dst


def warp_affine(
    src: np.ndarray,
    dst: np.ndarray,
    A: Affine,
    resampling: str,
    src_nodata: Nodata = None,
    dst_nodata: Nodata = None,
) -> np.ndarray:
    """Affine warp (same plane family): ``A`` maps dst pixel coords to src
    pixel coords — the reference's ``warp_affine`` call shape
    (``_warp.py:37-91``)."""
    r = _check_mode(resampling)
    XX, YY = _dst_center_grid(dst.shape)
    xs = A.a * XX + A.b * YY + A.c
    ys = A.d * XX + A.e * YY + A.f
    if r == "average":
        back = ~A

        def fwd(px, py):
            return back.a * px + back.b * py + back.c, back.d * px + back.e * py + back.f

        return _warp_average(src, dst, fwd, xs, ys, src_nodata, dst_nodata)
    return _warp_gather(src, dst, xs, ys, r, src_nodata, dst_nodata)


def reproject(
    src: np.ndarray,
    dst: np.ndarray,
    s_gbox: GeoBox,
    d_gbox: GeoBox,
    resampling: str,
    src_nodata: Nodata = None,
    dst_nodata: Nodata = None,
) -> np.ndarray:
    """GeoBox → GeoBox reprojection — the reference's ``rio_reproject``
    call shape (``_warp.py:120-169``).  Same-CRS pairs compose affines;
    EPSG:4326 ↔ EPSG:3857 goes through the closed-form transform."""
    r = _check_mode(resampling)
    if s_gbox.crs == d_gbox.crs:
        A = (~s_gbox.affine) * d_gbox.affine  # dst pix -> world -> src pix
        return warp_affine(src, dst, A, r, src_nodata=src_nodata, dst_nodata=dst_nodata)

    d2s = get_transformer(d_gbox.crs, s_gbox.crs)
    s2d = get_transformer(s_gbox.crs, d_gbox.crs)
    inv_s = ~s_gbox.affine
    inv_d = ~d_gbox.affine

    def back_pix(px: np.ndarray, py: np.ndarray):
        wx = d_gbox.affine.a * px + d_gbox.affine.b * py + d_gbox.affine.c
        wy = d_gbox.affine.d * px + d_gbox.affine.e * py + d_gbox.affine.f
        sx, sy = d2s(wx, wy)
        return (inv_s.a * sx + inv_s.b * sy + inv_s.c, inv_s.d * sx + inv_s.e * sy + inv_s.f)

    def fwd_pix(px: np.ndarray, py: np.ndarray):
        wx = s_gbox.affine.a * px + s_gbox.affine.b * py + s_gbox.affine.c
        wy = s_gbox.affine.d * px + s_gbox.affine.e * py + s_gbox.affine.f
        dx, dy = s2d(wx, wy)
        return (inv_d.a * dx + inv_d.b * dy + inv_d.c, inv_d.d * dx + inv_d.e * dy + inv_d.f)

    XX, YY = _dst_center_grid(dst.shape)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        xs, ys = back_pix(XX, YY)
        if r == "average":
            return _warp_average(src, dst, fwd_pix, xs, ys, src_nodata, dst_nodata)
        return _warp_gather(src, dst, xs, ys, r, src_nodata, dst_nodata)


# reference-name alias (call shape parity with _warp.py:120)
rio_reproject = reproject
