"""MGRS references: published vectors, three-dialect parity, domain guard."""

import random

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.geom.mgrs import mgrs_cols, py_mgrs, sql_mgrs_exprs


def test_published_vectors():
    # Eiffel Tower — the commonly cited 1 m reference
    assert py_mgrs(2.2945, 48.8582) == "31UDQ4825111932"
    # equator × prime meridian — the canonical 31NAA66021 00000 example
    assert py_mgrs(0.0, 0.0) == "31NAA6602100000"


def test_structural_rules():
    # column-letter runs per zone mod 3: zone 31 ≡ 1 → A–H,
    # zone 32 ≡ 2 → J–R, zone 33 ≡ 0 → S–Z (probe near each central
    # meridian where easting ≈ 500000 → col index 4)
    assert py_mgrs(3.0, 10.0)[3] in "ABCDEFGH"     # zone 31
    assert py_mgrs(9.0, 10.0)[3] in "JKLMNPQR"     # zone 32
    assert py_mgrs(15.0, 10.0)[3] in "STUVWXYZ"    # zone 33
    # even-zone row shift: same latitude, adjacent zones → row letters
    # differ by the +5 offset in the 20-cycle
    r31 = py_mgrs(3.0, 10.0)[4]
    r32 = py_mgrs(9.0, 10.0)[4]
    rows = "ABCDEFGHJKLMNPQRSTUV"
    assert (rows.index(r32) - rows.index(r31)) % 20 == 5
    # southern hemisphere uses the false northing (row from n ≥ 0)
    s = py_mgrs(151.2153, -33.8568)
    assert s.startswith("56H")
    # band letters skip I and O
    assert "I" not in "".join(py_mgrs(3.0, la)[2] for la in range(-79, 83, 8))


def test_domain_guard():
    with pytest.raises(ValueError, match="UPS"):
        py_mgrs(0.0, 85.0)
    with pytest.raises(ValueError, match="UPS"):
        py_mgrs(0.0, -80.5)


def test_three_dialect_parity(spark):
    """Catalyst, DuckDB, and the numpy reference agree on fuzz points."""
    from datacube_core_spark.geom.tmerc import (
        sql_utm_exprs,
        sql_utm_zone,
        utm_staged_df,
    )

    rng = random.Random(99)
    pts = [(i, rng.uniform(-179.9, 179.9), rng.uniform(-79.9, 83.9))
           for i in range(300)]
    df = spark.createDataFrame(pts, "i int, lon double, lat double")
    parts = mgrs_cols(F.col("zone"), F.col("lat"),
                      F.col("easting"), F.col("northing"))
    got = {
        r.i: r.m
        for r in utm_staged_df(df, lon_col="lon", lat_col="lat")
        .select("i", parts["mgrs"].alias("m")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", pts)
    e_sql, n_sql = sql_utm_exprs("lon", "lat", "zone")
    mg = sql_mgrs_exprs("zone", "lat", e_sql, n_sql)
    drows = dict(con.execute(
        f"SELECT i, {mg['mgrs']} FROM (SELECT i, lon, lat,"
        f" {sql_utm_zone('lon')} AS zone FROM t)"
    ).fetchall())
    for i, lon, lat in pts:
        want = py_mgrs(lon, lat)
        assert got[i] == want, (lon, lat, got[i], want)
        assert drows[i] == want, (lon, lat, drows[i], want)


def test_plan_is_pure_catalyst(spark):
    from datacube_core_spark.geom.tmerc import utm_staged_df

    df = spark.createDataFrame([Row(i=1, lon=2.2945, lat=48.8582)])
    parts = mgrs_cols(F.col("zone"), F.col("lat"),
                      F.col("easting"), F.col("northing"))
    out = utm_staged_df(df).select(parts["mgrs"].alias("m"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_parse_inverse_fuzz():
    """3000-point forward→parse roundtrip reproduces exact floors."""
    import math

    import numpy as np

    from datacube_core_spark.geom.mgrs import py_mgrs, py_parse_mgrs
    from datacube_core_spark.geom.tmerc import (
        E0_UTM,
        N0_NORTH,
        N0_SOUTH,
        tmerc_forward,
        utm_lon0,
        utm_zone_of,
    )

    rng = random.Random(5)
    for _ in range(3000):
        lon, lat = rng.uniform(-179.99, 179.99), rng.uniform(-79.99, 83.99)
        ref = py_mgrs(lon, lat)
        zone, band, e, n = py_parse_mgrs(ref)
        z = int(utm_zone_of(np.array([lon]))[0])
        n0 = N0_NORTH if lat >= 0 else N0_SOUTH
        ee, nn = tmerc_forward(np.array([lon]), np.array([lat]),
                               utm_lon0(z), e0=E0_UTM, n0=n0)
        assert zone == z
        assert e == math.floor(float(ee[0]))
        assert n == math.floor(float(nn[0])), (lon, lat, ref)


def test_parse_rejects_malformed():
    from datacube_core_spark.geom.mgrs import py_parse_mgrs

    for bad in ("", "31U", "31UDQ123", "XXUDQ4825111932"):
        with pytest.raises(ValueError):
            py_parse_mgrs(bad)


def test_parse_three_dialect_parity(spark):
    import duckdb as _d

    from datacube_core_spark.geom.mgrs import (
        parse_mgrs_cols,
        py_mgrs,
        py_parse_mgrs,
        sql_parse_mgrs_exprs,
    )

    rng = random.Random(17)
    refs = [py_mgrs(rng.uniform(-179.9, 179.9), rng.uniform(-79.9, 83.9))
            for _ in range(200)]
    df = spark.createDataFrame([(i, r) for i, r in enumerate(refs)],
                               "i int, mgrs string")
    rec = parse_mgrs_cols(F.col("mgrs"))
    got = {
        r.i: (r.z, r.e, r.n)
        for r in df.select("i", rec["zone"].alias("z"),
                           rec["easting"].alias("e"),
                           rec["northing"].alias("n")).collect()
    }
    con = _d.connect()
    con.execute("CREATE TABLE t (i INT, mgrs VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", list(enumerate(refs)))
    pm = sql_parse_mgrs_exprs("mgrs")
    drows = {
        i: (z, e, n)
        for i, z, e, n in con.execute(
            f"SELECT i, {pm['zone']}, {pm['easting']}, {pm['northing']} FROM t"
        ).fetchall()
    }
    for i, ref in enumerate(refs):
        zone, _, e, n = py_parse_mgrs(ref)
        assert got[i] == (zone, e, n), ref
        assert drows[i] == (zone, e, n), ref
