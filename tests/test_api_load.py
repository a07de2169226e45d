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
