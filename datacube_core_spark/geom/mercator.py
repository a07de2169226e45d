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


def get_transformer(src_crs: str, dst_crs: str) -> Callable[[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]:
    """Point transform src→dst for the supported CRS pairs; raises
    NotImplementedError for anything else (mirrors the documented
    environment block for arbitrary CRS — reference delegates to pyproj,
    ``_base.py:305-346``)."""
    s, d = _norm_crs(src_crs), _norm_crs(dst_crs)
    if s == d:
        return lambda xs, ys: (np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64))
    if (s, d) == (EPSG_4326, EPSG_3857):
        return lonlat_to_merc
    if (s, d) == (EPSG_3857, EPSG_4326):
        return merc_to_lonlat
    raise NotImplementedError(
        f"no closed-form transform {src_crs} -> {dst_crs} (pyproj not available; "
        "supported: identity, EPSG:4326 <-> EPSG:3857)"
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
