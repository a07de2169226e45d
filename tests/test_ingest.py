"""Ingest sink tests: partitioned layout, pruning, sorted row groups."""

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom import GRID_PAGES
from datacube_core_spark.operators.ingest import (
    executed_plan,
    ingest_pages,
    read_ingested,
    scan_tiles,
)
from datacube_core_spark.operators.grouping import solar_offset_timedelta
from datacube_core_spark.operators.tiling import with_tile
from datacube_core_spark.sources.pages import pages

from .conftest import SF_TINY


def test_ingest_roundtrip_and_pruning(spark, tmp_path):
    out = str(tmp_path / "ingested")
    p = pages(spark, SF_TINY)
    ingest_pages(p, out, GRID_PAGES, n_buckets=16)

    back = read_ingested(spark, out)
    assert back.count() == p.count()
    assert "tile_bucket" in back.columns and "tile_x" in back.columns

    # text byte-identity survives the ingest round trip (BASELINE gate)
    orig = {r["url"]: r["text"] for r in p.select("url", "text").collect()}
    for r in back.select("url", "text").collect():
        assert orig[r["url"]] == r["text"]

    # pick a populated tile and verify directory-level pruning
    row = with_tile(p, GRID_PAGES).groupBy("tile_x", "tile_y").count().orderBy(F.desc("count")).first()
    sub = scan_tiles(spark, out, row["tile_x"], row["tile_y"], n_buckets=16)
    assert sub.count() == row["count"]
    plan = executed_plan(sub)
    assert "PartitionFilters" in plan and "tile_bucket" in plan.split("PartitionFilters")[1][:120]
    assert "PushedFilters" in plan  # tile_x/tile_y reach the parquet scan


def test_solar_offset():
    import datetime

    assert solar_offset_timedelta(150.0, "h") == datetime.timedelta(hours=10)
    assert solar_offset_timedelta(-150.0, "h") == datetime.timedelta(hours=-10)
    assert solar_offset_timedelta(150.5, "s") == datetime.timedelta(seconds=int(150.5 * 240))
