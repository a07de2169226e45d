"""Ingest pipeline: source → gridded, partition-pruned sink.

The reference's ingest (``datacube/scripts/ingest.py:236-300``) reads,
reprojects tile-by-tile, writes NetCDF and indexes the results; the
engine's analog is the *ingest-time schema/partition design* that SURVEY
§4 calls out as where pushdown is actually won:

* rows get their spatial columns (geocode + tile index) at ingest;
* the sink is partitioned by a bounded tile bucket (directory-level
  pruning — the Iceberg partition-spec analog; raw tile_x would create
  ~90 dirs/axis, the bucket keeps file counts sane at scale);
* rows are sorted within partitions by (tile_x, tile_y, warc_ts) so
  min/max column stats (Parquet row-group stats ≈ Iceberg manifests)
  prune within a partition too.

``verify_pruning`` exposes the executed plan's partition filters so tests
(and operators built on the ingested table) can assert pruning happened.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.grid import GridSpec
from .tiling import with_tile

DEFAULT_BUCKETS = 64


def tile_bucket_col(tile_x, tile_y, n_buckets: int = DEFAULT_BUCKETS):
    """Stable bounded partition key from the tile index."""
    return F.pmod(F.hash(tile_x, tile_y), F.lit(n_buckets))


def ingest_pages(
    pages_df: DataFrame,
    out_path: str,
    grid: GridSpec,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Geocode → tile-assign → partitioned, sorted write."""
    tiled = with_tile(pages_df, grid)
    tiled = tiled.withColumn("tile_bucket", tile_bucket_col(F.col("tile_x"), F.col("tile_y"), n_buckets))
    (
        tiled.repartition(F.col("tile_bucket"))
        .sortWithinPartitions("tile_x", "tile_y", "warc_ts")
        .write.mode(mode)
        .partitionBy("tile_bucket")
        .parquet(out_path)
    )


def read_ingested(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_tiles(
    spark: SparkSession,
    path: str,
    tile_x: int,
    tile_y: int,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Point lookup of one tile: partition-directory pruning via the
    bucket predicate + row-group pruning via the sorted tile columns."""
    bucket = tile_bucket_col(F.lit(tile_x), F.lit(tile_y), n_buckets)
    return (
        read_ingested(spark, path)
        .where(F.col("tile_bucket") == bucket)
        .where((F.col("tile_x") == tile_x) & (F.col("tile_y") == tile_y))
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()
