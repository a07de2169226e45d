"""Web-interop cell keys: geohash and slippy/Bing quadkey encoders.

Rounds out the engine's cell-encoding family (S2 ids in ``geom/s2.py``,
UTM/Albers/LCC projected grids, GridSpec tiles): geohash and quadkey are
the two string cell keys web corpora are most often already bucketed by,
so a join against an external geohash- or quadkey-keyed table becomes a
plain equi-join on a computed column — the same interop contract the S2
ids serve for integer keys.  Reference analog: the PostGIS driver's
crs-indexed spatial key columns (``drivers/postgis/_spatial.py:62-97``);
this engine computes keys in the plan instead of in an index.

Both encoders are pure integer/bit arithmetic after one floor, written
identically as Catalyst columns and DuckDB SQL (64-bit ops in both), so
the oracle verifies them bit-for-bit:

- geohash: lon/lat quantized to 2^ceil(5p/2) / 2^floor(5p/2) steps, bits
  Morton-interleaved lon-first, 5-bit groups → base32 chars (published
  Niemeyer construction).
- quadkey: Web-Mercator tile (x, y) at zoom z (slippy map tilenames:
  x from lon linearly, y from the EPSG:3857 Mercator ordinate), digits
  d_i = 2·y_bit + x_bit from MSB (published Bing Maps tile system).

The Mercator ``ln(tan(...))`` reuses ``geom/mercator.py``'s fixed
operation order; the ≤1-ulp libm caveat documented there applies (only
points astronomically close to a tile edge could flip — the synthetic
corpus quantizes coordinates to 1e-6 degrees, nowhere near an edge).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datacube_core_spark.geom.mercator import PI

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# Morton spread masks: 20-bit int -> bits at even positions of a 40-bit int
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


# ---------------------------------------------------------------------------
# geohash
# ---------------------------------------------------------------------------

def _spread_col(x: Column) -> Column:
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _sql_spread(x: str) -> str:
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def geohash_col(lon: Column, lat: Column, precision: int = 8) -> Column:
    """Base32 geohash of ``precision`` characters, pure Catalyst.

    ``precision`` ≤ 8 keeps both quantized ints within the 20-bit Morton
    spread (8 chars = 40 bits = 20 lon + 20 lat ≈ 19 m cells at the
    equator — finer than any join this engine does on string keys).
    """
    if not 1 <= precision <= 8:
        raise ValueError("geohash precision must be in 1..8")
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lon_i = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits)))
    lat_i = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits)))
    lon_i = F.least(F.greatest(lon_i, F.lit(0)), F.lit((1 << lon_bits) - 1)).cast("long")
    lat_i = F.least(F.greatest(lat_i, F.lit(0)), F.lit((1 << lat_bits) - 1)).cast("long")
    # geohash interleaves lon-first from the MSB.  With an even bit total
    # (equal counts) that puts lon on the ODD positions (spread << 1);
    # with an odd total (lon has one extra bit) lon's MSB must land at
    # position bits-1 = 2·(lon_bits-1), i.e. lon stays on the EVEN
    # positions and lat shifts — the parity of `bits` picks the shift.
    if bits % 2 == 0:
        combined = F.shiftleft(_spread_col(lon_i), 1).bitwiseOR(_spread_col(lat_i))
    else:
        combined = _spread_col(lon_i).bitwiseOR(F.shiftleft(_spread_col(lat_i), 1))
    chars = [
        F.substring(
            F.lit(GEOHASH_B32),
            (F.shiftrightunsigned(combined, bits - 5 * (i + 1)).bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
            F.lit(1),
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def sql_geohash(lon: str, lat: str, precision: int = 8) -> str:
    """DuckDB twin of :func:`geohash_col` (same op order)."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lon_i = (
        f"GREATEST(LEAST(CAST(FLOOR(({lon} + 180.0) / 360.0 * {float(1 << lon_bits)!r}) AS BIGINT),"
        f" {(1 << lon_bits) - 1}), 0)"
    )
    lat_i = (
        f"GREATEST(LEAST(CAST(FLOOR(({lat} + 90.0) / 180.0 * {float(1 << lat_bits)!r}) AS BIGINT),"
        f" {(1 << lat_bits) - 1}), 0)"
    )
    if bits % 2 == 0:
        combined = f"(({_sql_spread(lon_i)} << 1) | {_sql_spread(lat_i)})"
    else:
        combined = f"({_sql_spread(lon_i)} | ({_sql_spread(lat_i)} << 1))"
    parts = [
        f"substr('{GEOHASH_B32}', CAST((({combined} >> {bits - 5 * (i + 1)}) & 31) + 1 AS INT), 1)"
        for i in range(precision)
    ]
    return " || ".join(parts)


# ---------------------------------------------------------------------------
# slippy tiles / Bing quadkey
# ---------------------------------------------------------------------------

def tile_xy_cols(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy-map tile (x, y) at ``zoom`` (OSM tilename convention)."""
    n = float(1 << zoom)
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    merc = F.log(F.tan((F.lit(90.0) + lat) * F.lit(PI) / F.lit(360.0)))
    ty = F.floor((F.lit(1.0) - merc / F.lit(PI)) / F.lit(2.0) * F.lit(n))
    hi = F.lit((1 << zoom) - 1)
    return (
        F.least(F.greatest(tx, F.lit(0)), hi).cast("long"),
        F.least(F.greatest(ty, F.lit(0)), hi).cast("long"),
    )


def quadkey_col(tx: Column, ty: Column, zoom: int) -> Column:
    """Bing quadkey string for a slippy tile: digit per zoom level,
    MSB first, d = 2·y_bit + x_bit."""
    digits = [
        (
            F.shiftrightunsigned(ty, i).bitwiseAND(F.lit(1)) * F.lit(2)
            + F.shiftrightunsigned(tx, i).bitwiseAND(F.lit(1))
        ).cast("string")
        for i in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits)


def sql_tile_xy(lon: str, lat: str, zoom: int) -> tuple[str, str]:
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    tx = (
        f"GREATEST(LEAST(CAST(FLOOR(({lon} + 180.0) / 360.0 * {n!r}) AS BIGINT), {hi}), 0)"
    )
    ty = (
        f"GREATEST(LEAST(CAST(FLOOR((1.0 - ln(tan((90.0 + {lat}) * {PI!r} / 360.0)) / {PI!r})"
        f" / 2.0 * {n!r}) AS BIGINT), {hi}), 0)"
    )
    return tx, ty


def sql_quadkey(tx: str, ty: str, zoom: int) -> str:
    parts = [
        f"CAST((({ty} >> {i}) & 1) * 2 + (({tx} >> {i}) & 1) AS VARCHAR)"
        for i in range(zoom - 1, -1, -1)
    ]
    return " || ".join(parts)
