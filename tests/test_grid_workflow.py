"""GridWorkflow parity tests — golden values from the reference's
tests/api/test_grid_workflow.py (FIXTURES.md §4.5): dataset coinciding
with cell (1,-2) on the (100, -10) grid; tile_buffer=(20,20) → 9 cells;
tile keys are (x, y, time); two datasets → 12 padded tiles."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom import GridSpec, box_ring
from datacube_core_spark.operators.grid_workflow import (
    cell_observations,
    list_cells,
    list_tiles,
    query_polygon_tiles_df,
)

GRID_E = GridSpec("EPSG:4326", tile_size=(100, 100), resolution=(-10, 10), origin=(0, 0))
T = datetime.datetime(2001, 2, 15)


@pytest.fixture()
def one_dataset(spark):
    # extent: box(left=100, bottom=-200, right=200, top=-100) -> cell (1,-2)
    return spark.createDataFrame(
        [(1, 100.0, -200.0, 200.0, -100.0, T)],
        "doc_id LONG, left DOUBLE, bottom DOUBLE, right DOUBLE, top DOUBLE, warc_ts TIMESTAMP",
    )


@pytest.fixture()
def two_datasets(spark, one_dataset):
    second = spark.createDataFrame(
        [(2, 200.0, -200.0, 300.0, -100.0, T)],
        "doc_id LONG, left DOUBLE, bottom DOUBLE, right DOUBLE, top DOUBLE, warc_ts TIMESTAMP",
    )
    return one_dataset.unionByName(second)


def test_dataset_in_expected_cell(spark, one_dataset):
    obs = cell_observations(one_dataset, GRID_E)
    cells = {(r["tile_x"], r["tile_y"]) for r in obs.collect()}
    assert cells == {(1, -2)}


def test_geopolygon_semi_join(spark, one_dataset):
    poly_tiles = query_polygon_tiles_df(spark, GRID_E, [[box_ring(100.0, -200.0, 200.0, -100.0)]])
    obs = cell_observations(one_dataset, GRID_E, query_polygon_tiles=poly_tiles)
    assert {(r["tile_x"], r["tile_y"]) for r in obs.collect()} == {(1, -2)}

    with pytest.raises(ValueError, match="tile_buffering and geopolygon"):
        cell_observations(one_dataset, GRID_E, query_polygon_tiles=poly_tiles, tile_buffer=(20, 20))


def test_tile_buffer_gives_nine_cells(spark, one_dataset):
    tiles = list_tiles(one_dataset, GRID_E, tile_buffer=(20, 20))
    assert tiles.count() == 9
    cells = {(r["tile_x"], r["tile_y"]) for r in tiles.collect()}
    assert cells == {(x, y) for x in (0, 1, 2) for y in (-3, -2, -1)}


def test_two_datasets_tiles_and_grouping(spark, two_datasets):
    unpadded = list_tiles(two_datasets, GRID_E)
    keys = {(r["tile_x"], r["tile_y"], r["time"]) for r in unpadded.collect()}
    assert keys == {(1, -2, T), (2, -2, T)}

    padded = list_tiles(two_datasets, GRID_E, tile_buffer=(20, 20))
    assert padded.count() == 12  # not 18 = 2*9 — shared cells group together

    # sorted dataset ids within the shared padded cells
    row = {(r["tile_x"], r["tile_y"]): [e["doc_id"] for e in r["datasets"]] for r in padded.collect()}
    assert row[(2, -2)] == [1, 2]  # both datasets, id order


def test_cell_index_mode(spark, two_datasets):
    obs = cell_observations(two_datasets, GRID_E, cell_index=(1, -2))
    assert [r["doc_id"] for r in obs.collect()] == [1]
    # buffered fixed cell picks up the neighbor dataset too
    obs_b = cell_observations(two_datasets, GRID_E, cell_index=(1, -2), tile_buffer=(20, 20))
    assert sorted(r["doc_id"] for r in obs_b.collect()) == [1, 2]


def test_list_cells_sorted_groups(spark, two_datasets):
    cells = list_cells(two_datasets, GRID_E, tile_buffer=(20, 20))
    r = {(x["tile_x"], x["tile_y"]): [e["doc_id"] for e in x["datasets"]] for x in cells.collect()}
    assert r[(2, -2)] == [1, 2]
    assert r[(0, -2)] == [1]
