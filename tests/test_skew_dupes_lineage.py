"""Tests: salted aggregation equivalence, leniency dup detection,
range-bucket join, lineage closure."""

import datetime

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.geom import GRID_PAGES
from datacube_core_spark.operators.dupes import duplicates_with_leniency, range_bucket_join
from datacube_core_spark.operators.lineage import lineage_closure
from datacube_core_spark.operators.skew import cell_histogram, pick_salt_factor, salted_agg
from datacube_core_spark.operators.tiling import with_tile
from datacube_core_spark.sources.pages import pages

from .conftest import SF_TINY


def test_salted_agg_equals_plain(spark):
    p = with_tile(pages(spark, SF_TINY), GRID_PAGES).select("tile_x", "tile_y", "doc_id", "lon")
    plain = {
        (r["tile_x"], r["tile_y"]): (r["n"], r["mx"], r["mn"])
        for r in p.groupBy("tile_x", "tile_y")
        .agg(F.count("doc_id").alias("n"), F.max("lon").alias("mx"), F.min("doc_id").alias("mn"))
        .collect()
    }
    salted = {
        (r["tile_x"], r["tile_y"]): (r["n"], r["mx"], r["mn"])
        for r in salted_agg(
            p,
            ["tile_x", "tile_y"],
            {"n": ("doc_id", "count"), "mx": ("lon", "max"), "mn": ("doc_id", "min")},
            salt_factor=8,
        ).collect()
    }
    assert salted == plain


def test_cell_histogram_skew_visible(spark):
    p = with_tile(pages(spark, SF_TINY, repl=4), GRID_PAGES)
    hist = cell_histogram(p).collect()
    counts = sorted((r["n"] for r in hist), reverse=True)
    # skew injection: the hot cells dominate (20% of rows in 3 boxes)
    assert counts[0] > 10 * counts[len(counts) // 2]
    assert pick_salt_factor(cell_histogram(p), target_rows_per_task=100) > 1


def test_duplicates_with_leniency(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    ms = datetime.timedelta(milliseconds=1)
    rows = [
        # group "u1": 3 rows chained within 500ms + 1 far away
        (1, "u1", t0), (2, "u1", t0 + 400 * ms), (3, "u1", t0 + 800 * ms),
        (4, "u1", t0 + 10_000 * ms),
        # group "u2": single row
        (5, "u2", t0),
        # group "u3": two rows exactly 500ms apart (inclusive)
        (6, "u3", t0), (7, "u3", t0 + 500 * ms),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING, warc_ts TIMESTAMP")
    out = {
        (r["url"], tuple(r["ids"])): r["n"]
        for r in duplicates_with_leniency(df, ["url"], leniency_ms=500).collect()
    }
    assert (("u1", (1, 2, 3))) in [(k[0], k[1]) for k in out]
    assert ("u3", (6, 7)) in out
    # the far row 4 is its own cluster of 1 -> not reported
    all_ids = [i for k in out for i in k[1]]
    assert 4 not in all_ids and 5 not in all_ids


def test_range_bucket_join(spark):
    t = datetime.datetime
    rows = [
        (1, t(2024, 1, 1, 0, 30), t(2024, 1, 1, 2, 30)),  # spans buckets 0,1,2
        (2, t(2024, 1, 1, 1, 15), t(2024, 1, 1, 1, 45)),  # bucket 1
    ]
    df = spark.createDataFrame(rows, "id LONG, b TIMESTAMP, e TIMESTAMP")
    out = {r["bucket"]: r["n"] for r in range_bucket_join(df, "b", "e", 3600).collect()}
    assert out[t(2024, 1, 1, 0, 0)] == 1
    assert out[t(2024, 1, 1, 1, 0)] == 2
    assert out[t(2024, 1, 1, 2, 0)] == 1


def test_lineage_closure(spark):
    #   1 <- 2 <- 3      (3 derived from 2 derived from 1)
    #   1 <- 4
    edges = spark.createDataFrame([(2, 1), (3, 2), (4, 1)], "dataset_id LONG, source_id LONG")
    roots = spark.createDataFrame([(3,)], "dataset_id LONG")
    anc = {(r["node"], r["distance"]) for r in lineage_closure(edges, roots, direction="sources").collect()}
    assert anc == {(3, 0), (2, 1), (1, 2)}

    roots2 = spark.createDataFrame([(1,)], "dataset_id LONG")
    desc = {(r["node"], r["distance"]) for r in lineage_closure(edges, roots2, direction="derived").collect()}
    assert desc == {(1, 0), (2, 1), (4, 1), (3, 2)}


def test_archive_less_mature_maturity_rule(spark):
    """The ADVICE repro: an nrt dataset arriving BEFORE its final version
    must be the one archived (reference keeps the most mature, 'final' <
    'nrt'); without maturity the rule is documented first-arrival-wins."""
    from datacube_core_spark.operators.dupes import archive_less_mature

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # cluster A: nrt arrives first, final 200ms later -> final survives
        (1, "p1", t0, "nrt"),
        (2, "p1", t0 + datetime.timedelta(milliseconds=200), "final"),
        # cluster B (outside leniency of A): single row stays live
        (3, "p1", t0 + datetime.timedelta(seconds=10), "nrt"),
        # different key: interim vs nrt -> interim survives
        (4, "p2", t0, "nrt"),
        (5, "p2", t0 + datetime.timedelta(milliseconds=100), "interim"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, key STRING, warc_ts TIMESTAMP, maturity STRING")
    out = {
        int(r["doc_id"]): bool(r["archived"])
        for r in archive_less_mature(df, ["key"], maturity_col="maturity").collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: True, 5: False}

    # first-arrival-wins when no maturity column is given
    legacy = {
        int(r["doc_id"]): bool(r["archived"])
        for r in archive_less_mature(df, ["key"]).collect()
    }
    assert legacy == {1: False, 2: True, 3: False, 4: False, 5: True}


def test_archive_less_mature_strict_raises_on_tie(spark):
    from datacube_core_spark.operators.dupes import archive_less_mature

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "p1", t0, "final"),
        (2, "p1", t0 + datetime.timedelta(milliseconds=100), "final"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, key STRING, warc_ts TIMESTAMP, maturity STRING")
    with pytest.raises(ValueError, match="equal-maturity"):
        archive_less_mature(df, ["key"], maturity_col="maturity", strict=True)
    # non-strict: documented (ts, id) fallback, no raise
    out = {int(r["doc_id"]): bool(r["archived"]) for r in
           archive_less_mature(df, ["key"], maturity_col="maturity").collect()}
    assert out == {1: False, 2: True}


def test_lineage_paths_diamond_enumerates_all_paths(spark):
    """Diamond provenance: the reference's UNION ALL CTE emits one row per
    distinct PATH, not per node — both routes to the shared grandparent
    must appear with their own classifier paths."""
    from datacube_core_spark.operators.lineage import lineage_paths

    # 10 -> {5 via 'a', 6 via 'b'}; 5 -> 1 via 'x'; 6 -> 1 via 'y'
    edges = spark.createDataFrame(
        [(10, 5, "a"), (10, 6, "b"), (5, 1, "x"), (6, 1, "y")],
        "dataset_id LONG, source_id LONG, classifier STRING",
    )
    roots = spark.createDataFrame([(10,)], "dataset_id LONG")
    out = {(int(r["node"]), r["path"]) for r in lineage_paths(edges, roots).collect()}
    assert out == {(5, "a"), (6, "b"), (1, "a.x"), (1, "b.y")}

    # source_filter restricts on dataset attributes
    ds = spark.createDataFrame([(5, "keep"), (6, "drop"), (1, "keep")], "doc_id LONG, tag STRING")
    filt = {
        (int(r["node"]), r["path"])
        for r in lineage_paths(
            edges, roots, source_filter=F.col("tag") == "keep", datasets=ds
        ).collect()
    }
    assert filt == {(5, "a"), (1, "a.x"), (1, "b.y")}
