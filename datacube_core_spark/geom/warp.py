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

# the reference's full mode list (datacube/api/core.py:335-338).
# interpolating/convolution kernels: nearest, bilinear, cubic (Keys
# a=-0.5), cubic_spline (cubic B-spline, smoothing), lanczos (a=3),
# gauss (σ=1 truncated at 2px).  bucket statistics over contributing
# src pixel centers: average, mode, max, min, med, q1, q3 (quartiles are
# lower/upper order statistics at index (n-1)/4 and 3(n-1)/4 of the
# sorted bucket; med is the lower median; mode ties take the smallest
# value) — documented semantics, matching GDAL's intent where GDAL's own
# exact rule is backend-dependent.
INTERP_MODES = ("nearest", "bilinear", "cubic", "cubic_spline", "lanczos", "gauss")
BUCKET_MODES = ("average", "mode", "max", "min", "med", "q1", "q3")
RESAMPLING_MODES = INTERP_MODES + BUCKET_MODES


def is_resampling_nn(resampling: str) -> bool:
    """True iff the mode is nearest-neighbour (reference ``_warp.py:27``)."""
    return isinstance(resampling, str) and resampling.lower() == "nearest"


def _check_mode(resampling: str) -> str:
    r = resampling.lower()
    if r not in RESAMPLING_MODES:
        raise ValueError(
            f"Bad resampling parameter: {resampling} (implemented: {RESAMPLING_MODES})"
        )
    return r


# --- convolution kernels (weight of a src center at pixel distance d) ------

def _kern_cubic(d: np.ndarray) -> np.ndarray:
    """Keys bicubic, a = -0.5 (the classic interpolating cubic)."""
    a = -0.5
    d = np.abs(d)
    w = np.where(
        d <= 1,
        (a + 2) * d**3 - (a + 3) * d**2 + 1,
        np.where(d < 2, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0),
    )
    return w


def _kern_bspline(d: np.ndarray) -> np.ndarray:
    """Cubic B-spline (smoothing, non-interpolating — GDAL cubic_spline)."""
    d = np.abs(d)
    return np.where(
        d <= 1,
        (4.0 - 6.0 * d**2 + 3.0 * d**3) / 6.0,
        np.where(d < 2, (2.0 - d) ** 3 / 6.0, 0.0),
    )


def _kern_lanczos(d: np.ndarray, a: int = 3) -> np.ndarray:
    d = np.asarray(d, dtype=np.float64)
    out = np.sinc(d) * np.sinc(d / a)
    return np.where(np.abs(d) < a, out, 0.0)


def _kern_gauss(d: np.ndarray) -> np.ndarray:
    return np.exp(-0.5 * d * d)


_KERNELS = {
    "cubic": (_kern_cubic, 2),
    "cubic_spline": (_kern_bspline, 2),
    "lanczos": (_kern_lanczos, 3),
    "gauss": (_kern_gauss, 2),
}


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


def _warp_kernel_interp(
    src: np.ndarray,
    dst: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    mode: str,
    src_nodata: Nodata,
    dst_nodata: Nodata,
) -> np.ndarray:
    """Convolution-kernel resampling (cubic / cubic_spline / lanczos /
    gauss): weights w(dx)·w(dy) over the (2·support)² src centers around
    the back-projected dst center; edge-replicated; invalid neighbours
    excluded and weights renormalized."""
    kern, support = _KERNELS[mode]
    h, w = src.shape
    fx = xs - 0.5
    fy = ys - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    inside = (xs >= 0) & (xs <= w) & (ys >= 0) & (ys <= h) & np.isfinite(xs) & np.isfinite(ys)

    num = np.zeros(xs.shape, dtype=np.float64)
    den = np.zeros(xs.shape, dtype=np.float64)
    for oy in range(-support + 1, support + 1):
        yi = y0 + oy
        wy = kern(fy - yi)
        yc = yi.clip(0, h - 1)
        for ox in range(-support + 1, support + 1):
            xi = x0 + ox
            wx = kern(fx - xi)
            xc = xi.clip(0, w - 1)
            v = src[yc, xc].astype(np.float64)
            wgt = wx * wy
            if src_nodata is not None:
                m = _valid(src[yc, xc], src_nodata)
                wgt = np.where(m, wgt, 0.0)
            num += wgt * v
            den += wgt

    ok = inside & (np.abs(den) > 1e-9)
    out = np.divide(num, den, out=np.zeros_like(num), where=np.abs(den) > 1e-9)
    if np.issubdtype(dst.dtype, np.integer):
        out = np.rint(out)
    if dst_nodata is not None:
        dst[~ok] = dst_nodata
    dst[ok] = out[ok].astype(dst.dtype)
    return dst


def _warp_bucket_stat(
    src: np.ndarray,
    dst: np.ndarray,
    fwd_pix: Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]],
    back_xs: np.ndarray,
    back_ys: np.ndarray,
    stat: str,
    src_nodata: Nodata,
    dst_nodata: Nodata,
) -> np.ndarray:
    """Bucket statistics (average/mode/max/min/med/q1/q3): forward-map src
    pixel centers into dst pixels, compute the statistic per bucket; empty
    dst pixels fall back to a nearest sample via the back-projection."""
    sh, sw = src.shape
    dh, dw = dst.shape
    sxx, syy = _dst_center_grid((sh, sw))  # src pixel centers (pixel coords)
    dxs, dys = fwd_pix(sxx.ravel(), syy.ravel())
    jx = np.floor(dxs).astype(np.int64)
    jy = np.floor(dys).astype(np.int64)
    vals = src.ravel().astype(np.float64)
    ok = (jx >= 0) & (jx < dw) & (jy >= 0) & (jy < dh) & np.isfinite(dxs) & np.isfinite(dys)
    ok &= _valid(vals, src_nodata)

    stat_img = np.zeros((dh, dw), dtype=np.float64)
    got = np.zeros((dh, dw), dtype=bool)
    if stat == "average":
        sums = np.zeros((dh, dw), dtype=np.float64)
        cnts = np.zeros((dh, dw), dtype=np.int64)
        np.add.at(sums, (jy[ok], jx[ok]), vals[ok])
        np.add.at(cnts, (jy[ok], jx[ok]), 1)
        got = cnts > 0
        stat_img = np.divide(sums, cnts, out=stat_img, where=got)
    else:
        bucket = (jy[ok] * dw + jx[ok]).astype(np.int64)
        v = vals[ok]
        order = np.lexsort((v, bucket))
        b_s, v_s = bucket[order], v[order]
        if len(b_s):
            starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
            ends = np.r_[starts[1:], len(b_s)]
            ns = ends - starts
            ids = b_s[starts]
            if stat == "min":
                picked = v_s[starts]
            elif stat == "max":
                picked = v_s[ends - 1]
            elif stat in ("med", "q1", "q3"):
                k = {"q1": 1, "med": 2, "q3": 3}[stat]
                picked = v_s[starts + ((ns - 1) * k) // 4]
            elif stat == "mode":
                # run lengths of equal values within buckets; ties take the
                # smallest value (first run, since values sort ascending)
                new_run = np.r_[True, (v_s[1:] != v_s[:-1]) | (b_s[1:] != b_s[:-1])]
                run_starts = np.flatnonzero(new_run)
                run_ends = np.r_[run_starts[1:], len(v_s)]
                run_len = run_ends - run_starts
                run_bucket = b_s[run_starts]
                run_val = v_s[run_starts]
                picked = np.empty(len(starts), dtype=np.float64)
                best = np.zeros(len(starts), dtype=np.int64)
                bucket_pos = np.searchsorted(ids, run_bucket)
                for rs, rl, rv, bp in zip(run_starts, run_len, run_val, bucket_pos):
                    if rl > best[bp]:
                        best[bp] = rl
                        picked[bp] = rv
            else:
                raise ValueError(stat)
            stat_img.ravel()[ids] = picked
            got.ravel()[ids] = True

    if np.issubdtype(dst.dtype, np.integer):
        stat_img = np.rint(stat_img)

    # empty dst pixels: nearest fallback
    nf = np.array(dst, copy=True)
    _warp_gather(src, nf, back_xs, back_ys, "nearest", src_nodata, dst_nodata)
    out = np.where(got, stat_img.astype(dst.dtype), nf)
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
    if r in BUCKET_MODES:
        back = ~A

        def fwd(px, py):
            return back.a * px + back.b * py + back.c, back.d * px + back.e * py + back.f

        return _warp_bucket_stat(src, dst, fwd, xs, ys, r, src_nodata, dst_nodata)
    if r in _KERNELS:
        return _warp_kernel_interp(src, dst, xs, ys, r, src_nodata, dst_nodata)
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
        if r in BUCKET_MODES:
            return _warp_bucket_stat(src, dst, fwd_pix, xs, ys, r, src_nodata, dst_nodata)
        if r in _KERNELS:
            return _warp_kernel_interp(src, dst, xs, ys, r, src_nodata, dst_nodata)
        return _warp_gather(src, dst, xs, ys, r, src_nodata, dst_nodata)


# reference-name alias (call shape parity with _warp.py:120)
rio_reproject = reproject
