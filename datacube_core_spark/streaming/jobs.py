"""Structured Streaming jobs over the pages stream.

The reference has no streaming engine (SURVEY §2.10); its closest analogs
are incremental indexing and ``archive_less_mature`` dedup-on-arrival
(reference ``datacube/index/abstract.py:902-988``).  Spark-first
restatement:

* :func:`streaming_cell_counts` — incremental per-cell observation
  counts: watermark + tumbling window + groupBy(tile) — the streaming
  version of ``count_datasets_through_time``.
* :func:`streaming_dedup` — dedup-on-arrival:
  ``dropDuplicatesWithinWatermark`` on url (the reference archives the
  less-mature duplicate arriving within a time delta).
* :func:`stream_pages` — file-source stream with the pages schema
  (stands in for a readStream of the Iceberg table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.grid import GridSpec
from ..operators.tiling import point_tile_cols

PAGES_SCHEMA = (
    "doc_id LONG, url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, "
    "lang STRING, lon DOUBLE, lat DOUBLE"
)


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_cell_counts(
    stream: DataFrame,
    grid: GridSpec,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window per-tile page counts with late-data handling."""
    tx, ty = point_tile_cols(grid, F.col("lon"), F.col("lat"))
    return (
        stream.withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "tile_x", "tile_y")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket"), "tile_x", "tile_y", "n")
    )


def streaming_dedup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Dedup-on-arrival: keep the first page per url within the watermark
    horizon (archive_less_mature semantics for the streaming path)."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["url"])
