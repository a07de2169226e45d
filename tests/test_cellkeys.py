"""Geohash + quadkey encoders vs independent references and SQL twins."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.geom.cellkeys import (
    GEOHASH_B32,
    geohash_col,
    quadkey_col,
    sql_geohash,
    sql_quadkey,
    sql_tile_xy,
    tile_xy_cols,
)

# ---------------------------------------------------------------------------
# independent references: classic bisection geohash, digit-loop quadkey
# ---------------------------------------------------------------------------


def ref_geohash(lat: float, lon: float, precision: int) -> str:
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(GEOHASH_B32[ch])
            bit, ch = 0, 0
    return "".join(out)


def ref_quadkey(tx: int, ty: int, zoom: int) -> str:
    return "".join(
        str(((ty >> i) & 1) * 2 + ((tx >> i) & 1)) for i in range(zoom - 1, -1, -1)
    )


def _pts():
    # deterministic spread incl. hemisphere corners and cell-ish values
    pts = [(42.6, -5.6), (57.64911, 10.40744), (0.0, 0.0), (-33.87, 151.21),
           (40.0, -74.0), (-85.0, 179.999), (85.0, -179.999), (12.345678, -0.000001)]
    for k in range(40):
        pts.append((((k * 7919) % 17000) / 100.0 - 85.0, ((k * 104729) % 36000) / 100.0 - 180.0))
    return pts


def test_known_vectors(spark):
    df = spark.createDataFrame([Row(lat=42.6, lon=-5.6)])
    assert df.select(geohash_col(F.col("lon"), F.col("lat"), 5).alias("g")).collect()[0].g == "ezs42"
    df2 = spark.createDataFrame([Row(lat=57.64911, lon=10.40744)])
    got8 = df2.select(geohash_col(F.col("lon"), F.col("lat"), 8).alias("g")).collect()[0].g
    assert got8 == "u4pruydq"  # 8-char prefix of the published u4pruydqqvj
    # Bing Maps tile-system worked example: tile (3, 5) zoom 3 -> "213"
    t = spark.createDataFrame([Row(tx=3, ty=5)])
    assert t.select(quadkey_col(F.col("tx"), F.col("ty"), 3).alias("q")).collect()[0].q == "213"


@pytest.mark.parametrize("precision", [1, 2, 3, 5, 7, 8])
def test_geohash_matches_bisection_reference(spark, precision):
    rows = [Row(i=i, lat=la, lon=lo) for i, (la, lo) in enumerate(_pts())]
    got = (
        spark.createDataFrame(rows)
        .select("i", "lat", "lon", geohash_col(F.col("lon"), F.col("lat"), precision).alias("g"))
        .collect()
    )
    for r in got:
        assert r.g == ref_geohash(r.lat, r.lon, precision), (r.lat, r.lon, precision)


def test_tile_and_quadkey_match_reference(spark):
    zoom = 12
    rows = [Row(i=i, lat=la, lon=lo) for i, (la, lo) in enumerate(_pts())]
    tx, ty = tile_xy_cols(F.col("lon"), F.col("lat"), zoom)
    got = (
        spark.createDataFrame(rows)
        .select("lat", "lon", tx.alias("tx"), ty.alias("ty"),
                quadkey_col(tx, ty, zoom).alias("q"))
        .collect()
    )
    import math

    n = 1 << zoom
    for r in got:
        ref_tx = min(max(int((r.lon + 180.0) / 360.0 * n), 0), n - 1)
        lat_r = math.radians(r.lat)
        ref_ty = min(max(int((1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n), 0), n - 1)
        assert r.tx == ref_tx
        assert r.ty == ref_ty, (r.lat, r.ty, ref_ty)
        assert r.q == ref_quadkey(r.tx, r.ty, zoom)
        assert len(r.q) == zoom


@pytest.mark.parametrize("precision", [5, 8])
def test_sql_twins_match_spark(spark, precision):
    rows = [Row(i=i, lat=la, lon=lo) for i, (la, lo) in enumerate(_pts())]
    zoom = 12
    tx, ty = tile_xy_cols(F.col("lon"), F.col("lat"), zoom)
    got = (
        spark.createDataFrame(rows)
        .select("i", geohash_col(F.col("lon"), F.col("lat"), precision).alias("g"),
                quadkey_col(tx, ty, zoom).alias("q"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (i INT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)",
                    [(r.i, r.lat, r.lon) for r in rows])
    stx, sty = sql_tile_xy("lon", "lat", zoom)
    sql = (
        f"SELECT i, {sql_geohash('lon', 'lat', precision)} AS g, "
        f"{sql_quadkey(stx, sty, zoom)} AS q FROM pts"
    )
    duck = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    for r in got:
        assert duck[r.i] == (r.g, r.q)


def test_catalyst_only(spark):
    df = spark.createDataFrame([Row(lat=1.0, lon=2.0)])
    tx, ty = tile_xy_cols(F.col("lon"), F.col("lat"), 12)
    plan = (
        df.select(geohash_col(F.col("lon"), F.col("lat"), 8).alias("g"),
                  quadkey_col(tx, ty, 12).alias("q"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
