"""Math / ROI utilities (reference ``datacube/utils/math.py`` and
``datacube/utils/geometry/tools.py`` semantics, re-implemented).

These are the pure-numpy helpers the tile kernels use: value snapping,
nodata masks, axis→affine recovery, chunk slicing, ROI algebra.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple, Union

import numpy as np

from .affine import Affine


def maybe_zero(x: float, tol: float) -> float:
    return 0 if abs(x) < tol else x


def maybe_int(x: float, tol: float) -> Union[int, float]:
    """Snap almost-ints to actual ints; pass everything else through."""
    part = math.fmod(x, 1.0)
    whole = x - part
    if part > 0.5:
        part -= 1
        whole += 1
    elif part < -0.5:
        part += 1
        whole -= 1
    return int(whole) if abs(part) < tol else x


def snap_scale(s: float, tol: float = 1e-6) -> float:
    """Snap a scale to the nearest integer or simple 1/<int> fraction."""
    if abs(s) >= 1 - tol:
        return maybe_int(s, tol)
    if abs(s) < tol:
        return s
    s_inv = 1 / s
    s_inv_snapped = maybe_int(s_inv, tol)
    if s_inv_snapped is s_inv:
        return s
    return 1 / s_inv_snapped


def clamp(x, lo, up):
    assert lo <= up
    return lo if x < lo else up if x > up else x


def is_almost_int(x: float, tol: float) -> bool:
    x = abs(math.fmod(x, 1))
    if x > 0.5:
        x = 1 - x
    return x < tol


def valid_mask(xx: np.ndarray, nodata: Optional[float]) -> np.ndarray:
    """Mask of valid pixels (float: NaN always invalid)."""
    if xx.dtype.kind == "f":
        if nodata is None or (isinstance(nodata, float) and math.isnan(nodata)):
            return ~np.isnan(xx)
        return ~np.isnan(xx) & (xx != nodata)
    if nodata is None:
        return np.full_like(xx, True, dtype=bool)
    return xx != nodata


def invalid_mask(xx: np.ndarray, nodata: Optional[float]) -> np.ndarray:
    if xx.dtype.kind == "f":
        if nodata is None or (isinstance(nodata, float) and math.isnan(nodata)):
            return np.isnan(xx)
        return np.isnan(xx) | (xx == nodata)
    if nodata is None:
        return np.full_like(xx, False, dtype=bool)
    return xx == nodata


def data_resolution_and_offset(data: np.ndarray, fallback_resolution: Optional[float] = None):
    """(resolution, offset) from a regularly-sampled pixel-center axis."""
    if data.size < 2:
        if data.size < 1:
            raise ValueError("Can't calculate resolution for empty data")
        if fallback_resolution is None:
            raise ValueError("Can't calculate resolution with data size < 2")
        res = fallback_resolution
    else:
        res = (data[data.size - 1] - data[0]) / (data.size - 1.0)
        res = res.item()
    off = data[0] - 0.5 * res
    return res, off.item() if hasattr(off, "item") else off


def affine_from_axis(xx: np.ndarray, yy: np.ndarray, fallback_resolution=None) -> Affine:
    """Pixel→world affine from pixel-center axes ((0,0) = top-left corner
    of the top-left pixel)."""
    if fallback_resolution is not None:
        if isinstance(fallback_resolution, (float, int)):
            frx, fry = fallback_resolution, fallback_resolution
        else:
            frx, fry = fallback_resolution
    else:
        frx, fry = None, None
    xres, xoff = data_resolution_and_offset(xx, frx)
    yres, yoff = data_resolution_and_offset(yy, fry)
    return Affine.translation(xoff, yoff) * Affine.scale(xres, yres)


def iter_slices(shape: Tuple[int, ...], chunk_size: Tuple[int, ...]) -> Iterator[Tuple[slice, ...]]:
    """Chunk an nd-shape into slices; edge chunks may be smaller.

    >>> list(iter_slices((5,), (2,)))
    [(slice(0, 2, None),), (slice(2, 4, None),), (slice(4, 5, None),)]
    """
    assert len(shape) == len(chunk_size)
    num = [int(math.ceil(s / float(c))) for s, c in zip(shape, chunk_size)]
    for grid_index in np.ndindex(*num):
        yield tuple(
            slice(min(d * c, stop), min((d + 1) * c, stop))
            for d, c, stop in zip(grid_index, chunk_size, shape)
        )


def align_up(x: int, align: int) -> int:
    return (x + (align - 1)) // align * align


# -- ROI (tuple-of-slices) algebra ------------------------------------------

def roi_normalise(roi, shape):
    """Fill in None starts/stops and resolve negative indices."""
    if not isinstance(roi, tuple):
        roi = (roi,)
    if not isinstance(shape, tuple):
        shape = (shape,)

    def norm(s: slice, n: int) -> slice:
        start = 0 if s.start is None else (s.start + n if s.start < 0 else s.start)
        stop = n if s.stop is None else (s.stop + n if s.stop < 0 else s.stop)
        return slice(start, stop)

    return tuple(norm(s, n) for s, n in zip(roi, shape))


def roi_shape(roi) -> Tuple[int, ...]:
    if not isinstance(roi, tuple):
        roi = (roi,)
    return tuple(max(0, s.stop - s.start) for s in roi)


def roi_is_empty(roi) -> bool:
    return any(d <= 0 for d in roi_shape(roi))


def roi_intersect(a, b):
    def inter(sa: slice, sb: slice) -> slice:
        return slice(max(sa.start, sb.start), min(sa.stop, sb.stop))

    return tuple(inter(sa, sb) for sa, sb in zip(a, b))


def roi_pad(roi, pad: int, shape):
    def padded(s: slice, n: int) -> slice:
        return slice(max(0, s.start - pad), min(n, s.stop + pad))

    return tuple(padded(s, n) for s, n in zip(roi, shape))


def roi_center(roi) -> Tuple[float, ...]:
    return tuple((s.start + s.stop) * 0.5 for s in roi)
