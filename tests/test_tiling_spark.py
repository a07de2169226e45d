"""Parity tests: Spark tile operators vs the pure-python oracle.

The oracle is the geometry core (itself verified against the reference's
golden vectors in test_geom_core.py), run row-by-row over the same rows
Spark processes.  Row-for-row equality here is the BASELINE.md
correctness gate at test scale.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom import GRID_PAGES, BoundingBox, GridSpec
from datacube_core_spark.operators.tiling import explode_bbox_tiles, with_tile
from datacube_core_spark.sources.pages import BBOX_W_BASE, BBOX_W_STEP, pages

from .conftest import SF_TINY


@pytest.fixture(scope="module")
def pages_pdf(spark):
    return pages(spark, SF_TINY).select("doc_id", "lon", "lat", "text").toPandas()


def test_point_tile_parity(spark, pages_pdf):
    df = pages(spark, SF_TINY)
    got = with_tile(df, GRID_PAGES).select("doc_id", "tile_x", "tile_y").toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    exp = {
        int(r.doc_id): GRID_PAGES.point_tile(float(r.lon), float(r.lat))
        for r in pages_pdf.itertuples()
    }
    for r in got.itertuples():
        assert (r.tile_x, r.tile_y) == exp[int(r.doc_id)], f"doc {r.doc_id}"


def test_point_tile_parity_negative_y_grid(spark, pages_pdf):
    # grid with negative tile_size on y (upper-left origin, WELD-style)
    grid = GridSpec("EPSG:4326", tile_size=(-5.0, 5.0), resolution=(-0.01, 0.01), origin=(85.0, -180.0))
    df = pages(spark, SF_TINY)
    got = with_tile(df, grid).select("doc_id", "lon", "lat", "tile_x", "tile_y").toPandas()
    for r in got.itertuples():
        assert (r.tile_x, r.tile_y) == grid.point_tile(float(r.lon), float(r.lat)), f"doc {r.doc_id}"


def test_bbox_explode_parity(spark, pages_pdf):
    df = pages(spark, SF_TINY)
    w = BBOX_W_BASE + (F.col("doc_id") % 10).cast("double") * BBOX_W_STEP
    boxed = df.select(
        "doc_id",
        (F.col("lon") - w).alias("left"),
        (F.col("lat") - w).alias("bottom"),
        (F.col("lon") + w).alias("right"),
        (F.col("lat") + w).alias("top"),
    )
    got = explode_bbox_tiles(boxed, GRID_PAGES).select("doc_id", "tile_x", "tile_y").toPandas()
    got_set = {(int(r.doc_id), int(r.tile_x), int(r.tile_y)) for r in got.itertuples()}

    exp_set = set()
    for r in pages_pdf.itertuples():
        ww = BBOX_W_BASE + (int(r.doc_id) % 10) * BBOX_W_STEP
        bb = BoundingBox(r.lon - ww, r.lat - ww, r.lon + ww, r.lat + ww)
        for (tx, ty), _ in GRID_PAGES.tiles(bb):
            exp_set.add((int(r.doc_id), tx, ty))
    assert got_set == exp_set
    # exact row multiplicity too (explode emits each pair once)
    assert len(got) == len(exp_set)


def test_explode_plan_has_no_udf_and_prunes_columns(spark):
    df = pages(spark, SF_TINY)
    out = with_tile(df, GRID_PAGES).groupBy("tile_x", "tile_y").count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # html/text must be pruned from the parquet scan
    explained = out._jdf.queryExecution().toString()
    assert "text" not in explained.split("ReadSchema")[-1][:200]


def test_hier_rollup_fold_equals_per_level(spark):
    """The log-depth aggregate fold must equal per-level re-aggregation of
    the base table, and parent counts must equal the sum of children."""
    from datacube_core_spark.operators.hier import cell_cols, rollup_counts
    from datacube_core_spark.sources.pages import pages

    p = pages(spark, SF_TINY)
    out = rollup_counts(p, GRID_PAGES, max_res=3)
    got = {(r["res"], r["cx"], r["cy"]): r["n"] for r in out.collect()}

    for res in range(4):
        cx, cy = cell_cols(GRID_PAGES, res, 3, F.col("lon"), F.col("lat"))
        exp = {
            (res, r["cx"], r["cy"]): r["n"]
            for r in p.select(cx.alias("cx"), cy.alias("cy")).groupBy("cx", "cy").count()
            .withColumnRenamed("count", "n").collect()
        }
        sub = {k: v for k, v in got.items() if k[0] == res}
        assert sub == exp, f"res {res}"

    # parent = sum of its (present) children
    import collections
    by_parent = collections.Counter()
    for (res, cx, cy), n in got.items():
        if res == 3:
            by_parent[(2, cx >> 1, cy >> 1)] += n
    for k, v in by_parent.items():
        assert got[k] == v


def test_hier_rollup_plan_scans_base_once(spark):
    """Scale shape: the base table appears ONCE in the physical plan —
    coarser levels fold aggregates, they never re-scan the input."""
    from datacube_core_spark.operators.hier import rollup_counts
    from datacube_core_spark.sources.pages import pages

    out = rollup_counts(pages(spark, SF_TINY), GRID_PAGES, max_res=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") <= 1
