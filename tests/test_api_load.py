"""Datacube facade tests: observation grouping + density load (sparse vs
dense vs pure-python binning oracle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.api import Datacube
from datacube_core_spark.geom import GRID_PAGES
from datacube_core_spark.sources.pages import pages

from .conftest import SF_TINY

RES = 0.5  # 8x8 pixels per 4-degree tile


@pytest.fixture(scope="module")
def dc(spark):
    return Datacube(spark, SF_TINY)


def test_find_datasets_query(spark, dc):
    n = dc.find_datasets(lang="en").count()
    exp = pages(spark, SF_TINY).where(F.col("lang") == "en").count()
    assert n == exp


def test_load_observations_grouping(spark, dc):
    obs = dc.load_observations(group_by="solar_day", lang="en")
    rows = obs.collect()
    assert len(rows) > 0
    total = sum(len(r["datasets"]) for r in rows)
    assert total == dc.find_datasets(lang="en").count()
    for r in rows:
        ids = [e["_id"] for e in r["datasets"]]
        assert ids == sorted(ids) or [e["_sort"] for e in r["datasets"]] == sorted(
            e["_sort"] for e in r["datasets"]
        )


def test_density_sparse_matches_python_binning(spark, dc):
    sparse = dc.load_density(RES).collect()
    got = {(r["tile_x"], r["tile_y"], r["py"], r["px"]): r["n"] for r in sparse}

    pdf = pages(spark, SF_TINY).select("lon", "lat").toPandas()
    exp = {}
    for lon, lat in zip(pdf.lon, pdf.lat):
        tx, ty = GRID_PAGES.point_tile(lon, lat)
        tile_left = tx * 4.0 - 180.0
        tile_top = (ty + 1) * 4.0 - 90.0
        px = min(max(int(np.floor((lon - tile_left) / RES)), 0), 7)
        py = min(max(int(np.floor((tile_top - lat) / RES)), 0), 7)
        exp[(tx, ty, py, px)] = exp.get((tx, ty, py, px), 0) + 1
    assert got == exp


def test_density_dense_equals_sparse(spark, dc):
    sparse = dc.load_density(RES).collect()
    dense = dc.load_density(RES, dense=True).collect()
    dm = {(r["tile_x"], r["tile_y"]): np.array(r["raster"]).reshape(8, 8) for r in dense}
    for r in sparse:
        assert dm[(r["tile_x"], r["tile_y"])][r["py"], r["px"]] == r["n"]
    # dense totals match page count (sparsity: no empty tiles materialized)
    assert sum(int(a.sum()) for a in dm.values()) == pages(spark, SF_TINY).count()


def test_density_time_buckets(spark, dc):
    d = dc.load_density(RES, time_bucket="month")
    total = d.agg(F.sum("n")).collect()[0][0]
    assert total == pages(spark, SF_TINY).count()
    assert d.select("bucket").distinct().count() <= 12


def test_output_geobox_precedence():
    from datacube_core_spark.api import output_geobox
    from datacube_core_spark.geom import GRID_A, BoundingBox, GeoBox
    from datacube_core_spark.geom.grid import GRID_PAGES

    # like wins and is returned as-is
    gb = GRID_A.tile_geobox((0, 0))
    assert output_geobox(like=gb) is gb
    with pytest.raises(AssertionError):
        output_geobox(like=gb, output_crs="EPSG:4326")

    # explicit crs requires resolution
    with pytest.raises(ValueError, match="resolution"):
        output_geobox(output_crs="EPSG:4326")

    # grid_spec supplies crs/resolution/alignment defaults
    out = output_geobox(grid_spec=GRID_A, bbox=BoundingBox(10.0, 10.0, 11.0, 11.0))
    assert out.crs == "EPSG:4326"
    assert out.resolution == (-0.1, 0.1)
    assert out.shape == (10, 10)

    # load_hints sit between explicit and grid_spec
    out2 = output_geobox(
        load_hints={"output_crs": "EPSG:4326", "resolution": (-0.5, 0.5)},
        bbox=(0.0, 0.0, 2.0, 1.0),
    )
    assert out2.resolution == (-0.5, 0.5)
    assert out2.shape == (2, 4)

    with pytest.raises(ValueError, match="Bounds"):
        output_geobox(grid_spec=GRID_A)


def test_load_density_reprojected(spark):
    """dc.load(output_crs=...) analog: density rasters warped to Web
    Mercator; warped pixel values at back-projected centers equal the
    source density pixels (pointwise nearest-warp recompute)."""
    import numpy as np
    from datacube_core_spark.api import Datacube
    from datacube_core_spark.geom import GRID_MERC, GRID_PAGES
    from datacube_core_spark.geom.mercator import merc_to_lonlat

    dc = Datacube(spark, SF_TINY, repl=4)
    out = dc.load_density_reprojected(1.0)
    rows = out.collect()
    assert rows and any(max(r["raster"]) > 0 for r in rows)

    # source density for pointwise check
    src = {
        (r["tile_x"], r["tile_y"]): np.array(r["raster"]).reshape(r["h"], r["w"])
        for r in dc.load_density(1.0, dense=True).collect()
    }
    d_sx = abs(GRID_MERC.tile_size[1]); d_sy = abs(GRID_MERC.tile_size[0])
    d_ox = GRID_MERC.origin[1]; d_oy = GRID_MERC.origin[0]
    checked = 0
    for r in rows[:20]:
        arr = np.array(r["raster"]).reshape(r["h"], r["w"])
        d_left = r["dst_tx"] * d_sx + d_ox
        d_top = (r["dst_ty"] + 1) * d_sy + d_oy
        for (j, i) in [(0, 0), (3, 5), (7, 7)]:
            cx = d_left + (i + 0.5) * 256_000.0
            cy = d_top - (j + 0.5) * 256_000.0
            lon, lat = merc_to_lonlat(cx, cy)
            stx = int(np.floor((lon - (-180.0)) / 4.0))
            sty = int(np.floor((lat - (-90.0)) / 4.0))
            sarr = src.get((stx, sty))
            px = int(np.floor(lon - (stx * 4.0 - 180.0)))
            py = int(np.floor(((sty + 1) * 4.0 - 90.0) - lat))
            exp = 0
            if sarr is not None and 0 <= px < 4 and 0 <= py < 4:
                exp = int(sarr[py, px])
            if not (-85.051 < lat < 85.051):
                continue  # outside merc domain: kernel yields 0
            assert int(arr[j, i]) == exp, (r["dst_tx"], r["dst_ty"], j, i)
            checked += 1
    assert checked >= 30


def test_list_products_and_measurements(spark):
    """Reference dc.list_products()/list_measurements() parity surface."""
    dc = Datacube(spark, SF_TINY)
    prods = dc.list_products().collect()
    assert len(prods) == 1 and prods[0]["name"] == "pages"
    assert prods[0]["n_measurements"] == 8
    ms = dc.list_measurements().collect()
    assert len(ms) == 8
    by_name = {r["measurement"]: r for r in ms}
    assert "time" in by_name["warc_ts"]["aliases"]
    assert by_name["lon"]["dtype"] == "float64"
    assert all(r["product"] == "pages" for r in ms)
