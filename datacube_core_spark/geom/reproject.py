"""Reproject planning + paste kernel (the pixel execution engine's brain).

Ports the *semantics* of the reference's read planning (SURVEY §2.9):

* ``compute_axis_overlap`` / ``box_overlap`` — reference
  ``datacube/utils/geometry/tools.py:383-463``: overlap ROIs of two image
  planes related by scale+translation, with scale/translation snapping.
* ``compute_reproject_roi`` — ``tools.py:569-658``, LINEAR path: minimal
  src/dst ROIs + shrink scale.  (The non-linear path needs a CRS
  transformer — no pyproj in this environment; same-CRS/linear covers the
  engine's tile-to-tile work.)
* ``can_paste`` — ``datacube/storage/_read.py:35-85``: the paste fast
  path decision tree (integer scale, equal axis scaling, aligned ROIs,
  sub-pixel translation checks) — every reason string preserved.
* ``pick_read_scale`` — ``_read.py:88-109``.
* ``paste`` — the memcpy path itself (with integer decimation), numpy.

These run driver-side for planning and inside per-tile kernels on
executors; nothing here touches Spark.
"""

from __future__ import annotations

import math
from types import SimpleNamespace
from typing import Optional, Tuple

import numpy as np

from .affine import Affine
from .grid import GeoBox
from .mathx import is_almost_int, maybe_int, roi_shape, snap_scale


def is_affine_st(a: Affine, tol: float = 1e-10) -> bool:
    """True if affine is scale + translation only (no rotation/shear)."""
    return abs(a.b) < tol and abs(a.d) < tol


def native_pix_transform_linear(src: GeoBox, dst: GeoBox) -> Optional[Affine]:
    """src pixel → dst pixel affine, when the two share a CRS."""
    if src.crs != dst.crs:
        return None
    return (~dst.affine) * src.affine


def compute_axis_overlap(ns: int, nd: int, s: float, t: float) -> Tuple[slice, slice]:
    """Overlap slices along one axis; x_src = s * x_dst + t."""
    needs_flip = s < 0
    if needs_flip:
        s, t = -s, ns - t
    assert s > 0

    s_ = 1.0 / s
    t_ = -t * s_

    if t < 0:
        _in = (0, min(math.floor(t_), nd))
    else:
        _in = (min(math.floor(t), ns), 0)

    a = math.ceil(nd * s + t)
    if a <= ns:
        _out = (max(a, 0), nd)
    else:
        _out = (ns, max(0, math.ceil(ns * s_ + t_)))

    src, dst = (slice(_in[i], _out[i]) for i in range(2))
    if needs_flip:
        src = slice(ns - src.stop, ns - src.start)
    return (src, dst)


def box_overlap(src_shape, dst_shape, st: Affine, tol: float):
    """Overlap ROIs of two planes related by scale+translation
    (Xsrc = ST · Xdst), with scale/translation snapping."""
    sx, _, tx, _, sy, ty = st.to_tuple()
    sy = snap_scale(sy)
    sx = snap_scale(sx)
    ty = maybe_int(ty, tol)
    tx = maybe_int(tx, tol)
    s0, d0 = compute_axis_overlap(src_shape[0], dst_shape[0], sy, ty)
    s1, d1 = compute_axis_overlap(src_shape[1], dst_shape[1], sx, tx)
    return (s0, s1), (d0, d1)


def gbox_boundary_pix(shape, pts_per_side: int = 2) -> np.ndarray:
    """(N, 2) float32 (x, y) points along the pixel-space perimeter of an
    image plane of the given (h, w) shape."""
    h, w = shape
    xx = np.linspace(0, w, pts_per_side, dtype="float32")
    yy = np.linspace(0, h, pts_per_side, dtype="float32")
    top = np.stack([xx, np.full_like(xx, yy[0])], axis=1)
    bot = np.stack([xx, np.full_like(xx, yy[-1])], axis=1)
    left = np.stack([np.full_like(yy, xx[0]), yy], axis=1)
    right = np.stack([np.full_like(yy, xx[-1]), yy], axis=1)
    return np.concatenate([top, bot, left, right], axis=0)


def roi_boundary_pix(roi, pts_per_side: int = 2) -> np.ndarray:
    """Boundary (x, y) points of a normalized (row-slice, col-slice) ROI."""
    yy, xx = roi
    xs = np.linspace(xx.start, xx.stop, pts_per_side, dtype="float32")
    ys = np.linspace(yy.start, yy.stop, pts_per_side, dtype="float32")
    top = np.stack([xs, np.full_like(xs, ys[0])], axis=1)
    bot = np.stack([xs, np.full_like(xs, ys[-1])], axis=1)
    left = np.stack([np.full_like(ys, xs[0]), ys], axis=1)
    right = np.stack([np.full_like(ys, xs[-1]), ys], axis=1)
    return np.concatenate([top, bot, left, right], axis=0)


def roi_from_points(xy: np.ndarray, shape, padding: int = 0):
    """Envelope ROI (row-slice, col-slice) of a point cloud, padded and
    clipped to the image plane (reference ``tools.py:536-566``)."""
    ny, nx = shape
    lo = np.floor(xy.min(axis=0)).astype("int32") - padding
    hi = np.ceil(xy.max(axis=0)).astype("int32") + padding
    x0, x1 = int(np.clip(lo[0], 0, nx)), int(np.clip(hi[0], 0, nx))
    y0, y1 = int(np.clip(lo[1], 0, ny)), int(np.clip(hi[1], 0, ny))
    return (slice(y0, y1), slice(x0, x1))


def _apply_affine_pts(a: Affine, xy: np.ndarray) -> np.ndarray:
    x = a.a * xy[:, 0] + a.b * xy[:, 1] + a.c
    y = a.d * xy[:, 0] + a.e * xy[:, 1] + a.f
    return np.stack([x, y], axis=1)


def get_scale_from_linear_transform(a: Affine):
    """(sx, sy) scale components via the R·W·S decomposition — delegates
    to :mod:`..geom.affinetools` (the full decomposition lives there;
    the |Cholesky-diagonal| shortcut this module used is the same values,
    kept as one implementation to avoid drift)."""
    from .affinetools import get_scale_from_linear_transform as _impl

    return _impl(a)


def _pix_point_transforms(src: GeoBox, dst: GeoBox):
    """(back, fwd) point maps between pixel planes for cross-CRS pairs
    with a closed-form transform: back = dst pix → src pix, fwd = src pix
    → dst pix (reference ``native_pix_transform``, tools.py:466-497)."""
    from .mercator import get_transformer

    d2s = get_transformer(dst.crs, src.crs)
    s2d = get_transformer(src.crs, dst.crs)
    inv_s, inv_d = ~src.affine, ~dst.affine

    def back(xy: np.ndarray) -> np.ndarray:
        wx = dst.affine.a * xy[:, 0] + dst.affine.b * xy[:, 1] + dst.affine.c
        wy = dst.affine.d * xy[:, 0] + dst.affine.e * xy[:, 1] + dst.affine.f
        sx, sy = d2s(wx, wy)
        return np.stack(
            [inv_s.a * sx + inv_s.b * sy + inv_s.c, inv_s.d * sx + inv_s.e * sy + inv_s.f], axis=1
        )

    def fwd(xy: np.ndarray) -> np.ndarray:
        wx = src.affine.a * xy[:, 0] + src.affine.b * xy[:, 1] + src.affine.c
        wy = src.affine.d * xy[:, 0] + src.affine.e * xy[:, 1] + src.affine.f
        dx, dy = s2d(wx, wy)
        return np.stack(
            [inv_d.a * dx + inv_d.b * dy + inv_d.c, inv_d.d * dx + inv_d.e * dy + inv_d.f], axis=1
        )

    return back, fwd


def _local_back_scale(back, center_xy: np.ndarray, eps: float = 0.5):
    """(sx, sy) of the back map at a dst pixel point — src pixels per dst
    pixel along each axis (reference ``get_scale_at_point``, tools.py:337)."""
    pts = np.array(
        [center_xy, center_xy + [eps, 0.0], center_xy + [0.0, eps]], dtype=np.float64
    )
    out = back(pts)
    sx = abs(float(out[1, 0] - out[0, 0])) / eps
    sy = abs(float(out[2, 1] - out[0, 1])) / eps
    return sx, sy


def compute_reproject_roi(src: GeoBox, dst: GeoBox, tol: float = 0.05, padding: Optional[int] = None) -> SimpleNamespace:
    """Reproject plan: minimal overlap ROIs + shrink scale.

    Scale+translation transforms use the snapping ``box_overlap`` fast
    path; rotated/sheared linear transforms use boundary back-projection
    (reference ``compute_roi`` with 1-pixel padding); cross-CRS pairs
    with a closed-form transform (EPSG:4326 ↔ 3857) use the reference's
    non-linear path — 5-points-per-side boundary sampling
    (``tools.py:569-658``).  Returns SimpleNamespace(roi_src, roi_dst,
    scale, scale2, is_st, transform) — scale > 1 means the source
    shrinks to fit dst.
    """
    tr = native_pix_transform_linear(src, dst)
    if tr is None:
        from .mercator import have_transform

        if not have_transform(dst.crs, src.crs):
            raise NotImplementedError(
                "cross-CRS reprojection requires a coordinate transformer "
                f"({src.crs} -> {dst.crs}: pyproj not available; closed-form "
                "transforms exist only for EPSG:4326 <-> EPSG:3857)"
            )
        back, fwd = _pix_point_transforms(src, dst)
        pad = 1 if padding is None else padding
        with np.errstate(invalid="ignore", over="ignore"):
            xy = back(gbox_boundary_pix(dst.shape, 5).astype(np.float64))
        xy = xy[np.isfinite(xy).all(axis=1)]
        if len(xy) == 0:
            roi_src = (slice(0, 0), slice(0, 0))
            roi_dst = (slice(0, 0), slice(0, 0))
            scale2 = (1.0, 1.0)
        else:
            roi_src = roi_from_points(xy, src.shape, pad)
            if roi_src[0].stop <= roi_src[0].start or roi_src[1].stop <= roi_src[1].start:
                roi_dst = (slice(0, 0), slice(0, 0))
                scale2 = (1.0, 1.0)
            else:
                xy2 = fwd(roi_boundary_pix(roi_src, 5).astype(np.float64))
                xy2 = xy2[np.isfinite(xy2).all(axis=1)]
                roi_dst = roi_from_points(xy2, dst.shape, 0)
                center = np.array(
                    [
                        (roi_dst[1].start + roi_dst[1].stop) * 0.5,
                        (roi_dst[0].start + roi_dst[0].stop) * 0.5,
                    ]
                )
                scale2 = _local_back_scale(back, center)
        scale = min(scale2) if min(scale2) > 0 else 1.0
        return SimpleNamespace(
            roi_src=roi_src, roi_dst=roi_dst, scale=scale, scale2=scale2, is_st=False, transform=None
        )
    st = is_affine_st(tr)
    back = ~tr  # dst pixel -> src pixel
    if st and padding in (0, None):
        roi_src, roi_dst = box_overlap(src.shape, dst.shape, back, tol)
    else:
        pad = 1 if padding is None else padding
        xy = _apply_affine_pts(back, gbox_boundary_pix(dst.shape, 2))
        roi_src = roi_from_points(xy, src.shape, pad)
        if roi_src[0].stop <= roi_src[0].start or roi_src[1].stop <= roi_src[1].start:
            roi_dst = (slice(0, 0), slice(0, 0))
        else:
            xy2 = _apply_affine_pts(tr, roi_boundary_pix(roi_src, 2))
            roi_dst = roi_from_points(xy2, dst.shape, 0)

    sx, sy = get_scale_from_linear_transform(tr)
    scale2 = (1.0 / sx, 1.0 / sy)
    scale = min(scale2)
    return SimpleNamespace(
        roi_src=roi_src, roi_dst=roi_dst, scale=scale, scale2=scale2, is_st=st, transform=tr
    )


def can_paste(rr: SimpleNamespace, stol: float = 1e-3, ttol: float = 1e-2):
    """(True, None) if read+paste suffices; else (False, reason)."""
    if not rr.is_st:
        return False, "not ST"

    scale = rr.scale
    if not is_almost_int(scale, stol):
        return False, "non-integer scale"

    scale = round(scale)
    a = rr.transform * Affine.scale(scale, scale)  # src.overview[scale] -> dst
    sx, _, tx, _, sy, ty = a.to_tuple()

    if any(abs(abs(s) - 1) > stol for s in (sx, sy)):
        return False, "sx!=sy, probably"

    ny, nx = (n / scale for n in roi_shape(rr.roi_src))
    if not all(is_almost_int(n, stol) for n in (nx, ny)):
        return False, "src_roi doesn't align for scale"

    s_shape = (int(ny), int(nx))
    if s_shape != roi_shape(rr.roi_dst):
        return False, "src_roi/scale != dst_roi"

    if not all(is_almost_int(t, ttol) for t in (tx, ty)):
        return False, "sub-pixel translation"

    return True, None


def pick_read_scale(scale: float, tol: float = 1e-3) -> int:
    assert scale > 0
    if scale < 1:
        return 1
    if is_almost_int(scale, tol):
        scale = round(scale)
    return int(scale)


def paste(src: np.ndarray, dst: np.ndarray, rr: SimpleNamespace) -> None:
    """Execute the paste fast path in place: crop, integer-decimate, flip
    as needed, copy into dst ROI."""
    ok, reason = can_paste(rr)
    if not ok:
        raise ValueError(f"cannot paste: {reason}")
    scale = pick_read_scale(rr.scale)
    block = src[rr.roi_src]
    if scale > 1:
        block = block[::scale, ::scale]
    sx, _, _, _, sy, _ = (rr.transform * Affine.scale(scale, scale)).to_tuple()
    if sy < 0:
        block = block[::-1, :]
    if sx < 0:
        block = block[:, ::-1]
    dst[rr.roi_dst] = block
