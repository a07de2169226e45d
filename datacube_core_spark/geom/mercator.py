"""Closed-form EPSG:4326 ↔ EPSG:3857 (spherical Web Mercator) transform.

The sandbox has no pyproj/GDAL, but Web Mercator is pure math (the
published EPSG:3857 spherical formulas), which unlocks the engine's
cross-CRS path end-to-end: geometry ``to_crs`` (reference
``datacube/utils/geometry/_base.py:679-715``), cross-CRS
``compute_reproject_roi`` (reference ``tools.py:569-658`` non-linear
branch), and the warp kernel (reference ``_warp.py:37-169``).

Every formula is written with a FIXED operation order and the same
double-precision constants in all three dialects (numpy for kernels,
Catalyst columns for Spark plans, SQL strings for the DuckDB oracle), so
engines agree bit-for-bit on the multiplicative parts; the transcendental
calls (tan/log/exp/atan) may differ by ≤1 ulp between libm
implementations, which only matters for points astronomically close to a
pixel/tile boundary.

Forward (lon, lat in degrees → metres):
    x = R · lon · π / 180
    y = R · ln(tan((90 + lat) · π / 360))
Inverse:
    lon = x / R · 180 / π
    lat = (2·atan(exp(y / R)) − π/2) · 180 / π
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

R_MERC = 6378137.0
PI = 3.141592653589793
# latitude bound of the square Web Mercator world (y = ±π·R)
MAX_LAT = 85.05112877980659
# x/y extent of the world in metres (±)
MERC_BOUND = 20037508.342789244

EPSG_4326 = "EPSG:4326"
EPSG_3857 = "EPSG:3857"


def _norm_crs(crs: str) -> str:
    return crs.strip().upper().replace("EPSG: ", "EPSG:")


# ---------------------------------------------------------------------------
# numpy (kernels)
# ---------------------------------------------------------------------------

def lonlat_to_merc(lon, lat):
    """Vectorized forward transform (degrees → metres)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R_MERC * lon * PI / 180.0
    y = R_MERC * np.log(np.tan((90.0 + lat) * PI / 360.0))
    return x, y


def merc_to_lonlat(x, y):
    """Vectorized inverse transform (metres → degrees)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / R_MERC * 180.0 / PI
    lat = (2.0 * np.arctan(np.exp(y / R_MERC)) - PI / 2.0) * 180.0 / PI
    return lon, lat


# ---------------------------------------------------------------------------
# sinusoidal (ESRI:54008-style spherical sinusoidal, the MODIS grid family)
# — the second registered projection proving the transformer seam is
# generic, not mercator-shaped
# ---------------------------------------------------------------------------

R_SINU = 6371007.181  # authalic sphere radius used by the MODIS sinusoidal
ESRI_54008 = "ESRI:54008"


def lonlat_to_sinu(lon, lat):
    """x = R · lon_rad · cos(lat_rad); y = R · lat_rad."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lat_r = lat * PI / 180.0
    x = R_SINU * (lon * PI / 180.0) * np.cos(lat_r)
    y = R_SINU * lat_r
    return x, y


def sinu_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lat_r = y / R_SINU
    with np.errstate(divide="ignore", invalid="ignore"):
        lon = x / (R_SINU * np.cos(lat_r)) * 180.0 / PI
    return lon, lat_r * 180.0 / PI


# ---------------------------------------------------------------------------
# pluggable transformer registry
# ---------------------------------------------------------------------------

PointTransform = Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]

# (src, dst) -> numpy point transform.  ``register_transform`` installs
# both directions; unknown pairs compose through the EPSG:4326 pivot when
# both legs are registered (src→4326→dst), matching how pyproj pipelines
# chain through a geographic hub.  On a real cluster with pyproj present,
# a deployment registers ``Transformer.from_crs(s, d).transform`` here and
# every consumer (to_crs, compute_reproject_roi, the warp kernels, the
# distributed warp operator) lights up without code changes — this seam is
# the repo's answer to reference ``_base.py:305-346``.
_TRANSFORMS: dict = {}


def register_transform(src_crs: str, dst_crs: str, fwd: PointTransform, inv: PointTransform | None = None) -> None:
    """Register fwd (and optionally its inverse) for a CRS pair."""
    s, d = _norm_crs(src_crs), _norm_crs(dst_crs)
    _TRANSFORMS[(s, d)] = fwd
    if inv is not None:
        _TRANSFORMS[(d, s)] = inv


register_transform(EPSG_4326, EPSG_3857, lonlat_to_merc, merc_to_lonlat)
register_transform(EPSG_4326, ESRI_54008, lonlat_to_sinu, sinu_to_lonlat)


def _resolve_lazy(crs: str) -> None:
    """Auto-register natively-computable CRS families on first use —
    the 120 WGS84 UTM zones (EPSG:326xx/327xx, Krüger series in
    geom.tmerc) and the Albers equal-area conics (EPSG:3577 Australian /
    EPSG:5070 Conus, Snyder closed forms in geom.albers).  Keeps the
    registry small instead of pre-registering every zone."""
    if (crs, EPSG_4326) in _TRANSFORMS:
        return
    from .albers import albers_transforms
    from .lcc import lcc_transforms
    from .tmerc import utm_transforms

    pair = utm_transforms(crs) or albers_transforms(crs) or lcc_transforms(crs)
    if pair is not None:
        fwd, inv = pair
        register_transform(EPSG_4326, crs, fwd, inv)


def get_transformer(src_crs: str, dst_crs: str) -> PointTransform:
    """Point transform src→dst from the registry (identity, direct pair,
    or composed through the EPSG:4326 pivot); raises NotImplementedError
    for unregistered pairs (reference delegates to pyproj,
    ``_base.py:305-346`` — register pyproj transforms on a real cluster)."""
    s, d = _norm_crs(src_crs), _norm_crs(dst_crs)
    if s == d:
        return lambda xs, ys: (np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64))
    _resolve_lazy(s)
    _resolve_lazy(d)
    direct = _TRANSFORMS.get((s, d))
    if direct is not None:
        return direct
    leg1, leg2 = _TRANSFORMS.get((s, EPSG_4326)), _TRANSFORMS.get((EPSG_4326, d))
    if leg1 is not None and leg2 is not None:
        def composed(xs, ys, _l1=leg1, _l2=leg2):
            lon, lat = _l1(xs, ys)
            return _l2(lon, lat)
        return composed
    raise NotImplementedError(
        f"no registered transform {src_crs} -> {dst_crs} (pyproj not available in "
        f"this sandbox; registered pairs: {sorted(_TRANSFORMS)} — use "
        "register_transform() to add one)"
    )


def have_transform(src_crs: str, dst_crs: str) -> bool:
    try:
        get_transformer(src_crs, dst_crs)
        return True
    except NotImplementedError:
        return False


# ---------------------------------------------------------------------------
# Catalyst columns (Spark plans) — same operation order as numpy
# ---------------------------------------------------------------------------

def merc_x_col(lon_col):
    from pyspark.sql import functions as F

    return F.lit(R_MERC) * lon_col * F.lit(PI) / F.lit(180.0)


def merc_y_col(lat_col):
    from pyspark.sql import functions as F

    return F.lit(R_MERC) * F.log(F.tan((F.lit(90.0) + lat_col) * F.lit(PI) / F.lit(360.0)))


# ---------------------------------------------------------------------------
# Catalyst inverse registry (distributed-warp candidate windows)
# ---------------------------------------------------------------------------

# crs -> (inv_lon(x_col, y_col), inv_lat(x_col, y_col)) Catalyst builders.
# CONTRACT: over any axis-aligned (x, y) window, the registered inverse's
# lon/lat extremes must be attained on the window's corners or its y=0
# midline — true for cylindrical (3857) and pseudocylindrical (54008)
# projections; the warp operator samples exactly those points to build a
# covering lon/lat window for src-tile candidate enumeration.
_CATALYST_INV: dict = {}


def register_catalyst_inverse(crs: str, inv_lon, inv_lat) -> None:
    _CATALYST_INV[_norm_crs(crs)] = (inv_lon, inv_lat)


def catalyst_inverse(crs: str):
    got = _CATALYST_INV.get(_norm_crs(crs))
    if got is None:
        raise NotImplementedError(
            f"no Catalyst inverse registered for {crs} "
            f"(registered: {sorted(_CATALYST_INV)}; use register_catalyst_inverse)"
        )
    return got


def _merc_inv_lon_col(x_col, _y_col=None):
    from pyspark.sql import functions as F

    return x_col / F.lit(R_MERC) * F.lit(180.0) / F.lit(PI)


def _merc_inv_lat_col(_x_col, y_col):
    from pyspark.sql import functions as F

    return (F.lit(2.0) * F.atan(F.exp(y_col / F.lit(R_MERC))) - F.lit(PI) / F.lit(2.0)) * F.lit(180.0) / F.lit(PI)


def _sinu_inv_lon_col(x_col, y_col):
    from pyspark.sql import functions as F

    return x_col / (F.lit(R_SINU) * F.cos(y_col / F.lit(R_SINU))) * F.lit(180.0) / F.lit(PI)


def _sinu_inv_lat_col(_x_col, y_col):
    from pyspark.sql import functions as F

    return y_col / F.lit(R_SINU) * F.lit(180.0) / F.lit(PI)


register_catalyst_inverse(EPSG_3857, _merc_inv_lon_col, _merc_inv_lat_col)
register_catalyst_inverse(ESRI_54008, _sinu_inv_lon_col, _sinu_inv_lat_col)


# ---------------------------------------------------------------------------
# SQL strings (DuckDB oracle) — same operation order
# ---------------------------------------------------------------------------

def sql_merc_x(lon_expr: str) -> str:
    return f"{R_MERC!r} * {lon_expr} * {PI!r} / 180.0"


def sql_merc_y(lat_expr: str) -> str:
    return f"{R_MERC!r} * ln(tan((90.0 + {lat_expr}) * {PI!r} / 360.0))"


def sql_inv_merc_lon(x_expr: str) -> str:
    return f"{x_expr} / {R_MERC!r} * 180.0 / {PI!r}"


def sql_inv_merc_lat(y_expr: str) -> str:
    return f"(2.0 * atan(exp({y_expr} / {R_MERC!r})) - {PI!r} / 2.0) * 180.0 / {PI!r}"
