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


def compute_reproject_roi(src: GeoBox, dst: GeoBox, tol: float = 0.05) -> SimpleNamespace:
    """Linear-path reproject plan: minimal overlap ROIs + shrink scale.

    Returns SimpleNamespace(roi_src, roi_dst, scale, scale2, is_st,
    transform) — scale > 1 means the source shrinks to fit dst.
    """
    tr = native_pix_transform_linear(src, dst)
    if tr is None:
        raise NotImplementedError(
            "cross-CRS reprojection requires a coordinate transformer "
            "(pyproj not available in this environment)"
        )
    st = is_affine_st(tr)
    back = ~tr  # dst pixel -> src pixel
    if st:
        roi_src, roi_dst = box_overlap(src.shape, dst.shape, back, tol)
    else:
        raise NotImplementedError("rotated/sheared linear transforms not supported yet")

    sx = math.hypot(tr.a, tr.d)
    sy = math.hypot(tr.b, tr.e)
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
