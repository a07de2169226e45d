"""Affine-analysis utilities (reference ``datacube/utils/geometry/
tools.py:186-361``): broadcast application, pixel/sub-pixel translation
split, RWS decomposition, least-squares affine fit, and local scale
estimation for arbitrary (non-affine) point transforms.

These are the analysis half of the warp planner: ``get_scale_at_point``
linearizes a projection around a point (five-point stencil → LSQ affine →
scale from the RWS decomposition), which is how the reference's
``compute_reproject_roi``/``pick_read_scale`` estimate overview levels
for non-affine CRS transforms.  Pure numpy — no Spark dependency; used
driver-side and inside executor kernels alike.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence, Tuple

import numpy as np

from .affine import Affine


def apply_affine(a: Affine, x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Apply ``a`` to coordinate arrays of ANY shape (reference
    ``apply_affine``): returns arrays of the same shape."""
    shape = np.shape(x)
    xf = np.asarray(x, dtype=np.float64).ravel()
    yf = np.asarray(y, dtype=np.float64).ravel()
    ox = a.a * xf + a.b * yf + a.c
    oy = a.d * xf + a.e * yf + a.f
    return ox.reshape(shape), oy.reshape(shape)


def split_translation(t: Sequence[float]) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Split a translation into whole-pixel + sub-pixel parts with the
    sub-pixel component in [-0.5, +0.5] (reference ``split_translation``:
    ``x + t == x + t_whole + t_subpix``)."""

    def one(v: float) -> Tuple[float, float]:
        part = math.fmod(v, 1.0)
        whole = v - part
        if part > 0.5:
            part -= 1.0
            whole += 1.0
        elif part < -0.5:
            part += 1.0
            whole -= 1.0
        return whole, part

    pairs = [one(float(v)) for v in t]
    return tuple(p[0] for p in pairs), tuple(p[1] for p in pairs)


def decompose_rws(a):
    """A = R·W·S: rotation (orthogonal, det +1) × unit-diagonal shear ×
    diagonal scale (reference ``decompose_rws``; the standard QR-via-
    Cholesky construction — WS = chol(AᵀA)ᵀ is upper-triangular with
    positive diagonal, R = A·(WS)⁻¹ is orthogonal; a det(R) < 0 case
    flips the last column into the scale's sign).  Accepts an
    :class:`Affine` (returns Affine triple, translation rides on R) or a
    2×2 ndarray (returns ndarray triple).  Negative scales are ambiguous
    up to R(θ)S(s) == R(θ±180°)S(−s) — same convention as the
    reference."""
    if isinstance(a, Affine):
        m = np.array([[a.a, a.b], [a.d, a.e]], dtype=np.float64)
        r, w, s = decompose_rws(m)
        return (
            Affine(r[0, 0], r[0, 1], a.c, r[1, 0], r[1, 1], a.f),
            Affine(w[0, 0], w[0, 1], 0.0, w[1, 0], w[1, 1], 0.0),
            Affine(s[0, 0], s[0, 1], 0.0, s[1, 0], s[1, 1], 0.0),
        )
    a = np.asarray(a, dtype=np.float64)
    assert a.shape == (2, 2)
    ws = np.linalg.cholesky(a.T @ a).T
    r = a @ np.linalg.inv(ws)
    if np.linalg.det(r) < 0:
        r[:, -1] *= -1.0
        ws[-1, :] *= -1.0
    ss = np.diag(ws)
    s = np.diag(ss)
    w = ws @ np.diag(1.0 / ss)
    return r, w, s


def affine_from_pts(xx: Sequence[Tuple[float, float]], yy: Sequence[Tuple[float, float]]) -> Affine:
    """Least-squares affine A with Y ≈ A·X from ≥3 point pairs
    (reference ``affine_from_pts``)."""
    assert len(xx) == len(yy)
    assert len(xx) >= 3
    n = len(xx)
    design = np.ones((n, 3), dtype=np.float64)
    design[:, :2] = np.asarray(xx, dtype=np.float64)
    target = np.asarray(yy, dtype=np.float64)
    mm, *_ = np.linalg.lstsq(design, target, rcond=-1)
    a, d = mm[0]
    b, e = mm[1]
    c, f = mm[2]
    return Affine(a, b, c, d, e, f)


def get_scale_from_linear_transform(a: Affine) -> Tuple[float, float]:
    """|scale| components of the RWS decomposition (reference
    ``get_scale_from_linear_transform``): (sx, sy), both > 0."""
    _, _, s = decompose_rws(a)
    return abs(s.a), abs(s.e)


def get_scale_at_point(
    pt: Tuple[float, float],
    tr: Callable[[List[Tuple[float, float]]], List[Tuple[float, float]]],
    r: float = None,
) -> Tuple[float, float]:
    """Local |scale| of an arbitrary point transform around ``pt``
    (reference ``get_scale_at_point``): linearize with a five-point
    stencil of radius ``r`` (default 1), LSQ-fit an affine, take its RWS
    scale."""
    stencil = [(0, 0), (-1, 0), (0, -1), (1, 0), (0, 1)]
    x0, y0 = pt
    rr = 1.0 if r is None else float(r)
    xx = [(float(dx * rr + x0), float(dy * rr + y0)) for dx, dy in stencil]
    yy = tr(xx)
    return get_scale_from_linear_transform(affine_from_pts(xx, yy))
