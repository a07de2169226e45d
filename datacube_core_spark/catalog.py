"""Product/Measurement model + the index search API surface.

Mirrors the reference's metadata-plane API on a flat pages table:

* :class:`Measurement` / :class:`Product` — band descriptors with alias
  resolution preserving request order (reference
  ``datacube/model/__init__.py:302-349`` and ``:591-605``).
* :class:`PageIndex` — the ``index.datasets`` search surface (reference
  ``datacube/index/abstract.py``): ``search`` (predicate scan),
  ``search_returning`` (projection scan → column pruning),
  ``search_eager``/``search_summaries`` (materialization), ``count``,
  ``count_by_product``, ``count_datasets_through_time`` (windowed
  counts), ``get_product_time_bounds`` (min/max agg) — each lowered to a
  DataFrame plan; Catalyst provides the pushdown the reference gets from
  per-field Postgres indexes (SURVEY §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .geom.grid import GridSpec
from .plans.query import Query, Range
from .sources.pages import pages


@dataclass
class Measurement:
    """Band descriptor: name, dtype, nodata, units (+ aliases)."""

    name: str
    dtype: str = "float64"
    nodata: Optional[float] = None
    units: str = "1"
    aliases: Tuple[str, ...] = ()

    def canonical(self, name: str) -> bool:
        return name == self.name or name in self.aliases


@dataclass
class Product:
    """Schema for a family of datasets: measurements + optional grid."""

    name: str
    measurements: List[Measurement] = field(default_factory=list)
    grid_spec: Optional[GridSpec] = None

    def lookup_measurements(self, names: Optional[Sequence[str]] = None) -> List[Measurement]:
        """Resolve names or aliases, PRESERVING request order; all
        measurements in canonical order when names is None."""
        if names is None:
            return list(self.measurements)
        if isinstance(names, str):
            names = [names]
        out = []
        for n in names:
            for m in self.measurements:
                if m.canonical(n):
                    out.append(m)
                    break
            else:
                raise KeyError(f"measurement {n!r} not in product {self.name!r}")
        return out


PAGES_PRODUCT = Product(
    name="pages",
    measurements=[
        Measurement("doc_id", "int64"),
        Measurement("url", "object"),
        Measurement("warc_ts", "datetime64[ns]", aliases=("time", "timestamp")),
        Measurement("html", "bytes"),
        Measurement("text", "object", aliases=("content", "body")),
        Measurement("lang", "object", aliases=("language",)),
        Measurement("lon", "float64", aliases=("longitude", "x")),
        Measurement("lat", "float64", aliases=("latitude", "y")),
    ],
)


class PageIndex:
    """The reference ``index.datasets`` search surface over pages."""

    def __init__(self, spark: SparkSession, sf_dir: str, repl: int = 1, archived_col: Optional[str] = None):
        self.spark = spark
        self.sf_dir = sf_dir
        self._df = pages(spark, sf_dir, repl=repl)
        self.product = PAGES_PRODUCT
        self.archived_col = archived_col

    def _base(self) -> DataFrame:
        df = self._df
        if self.archived_col and self.archived_col in df.columns:
            # implicit archived-IS-NULL filter on every search (reference
            # drivers/postgres/_api.py:545)
            df = df.where(F.col(self.archived_col).isNull())
        return df

    def search(self, limit: Optional[int] = None, **query) -> DataFrame:
        df = Query(**query).apply(self._base())
        if limit is not None:
            df = df.limit(limit)
        return df

    def search_returning(self, fields: Sequence[str], limit: Optional[int] = None, **query) -> DataFrame:
        cols = [m.name for m in self.product.lookup_measurements(fields)]
        return self.search(limit=limit, **query).select(*cols)

    def search_eager(self, **query) -> list:
        return self.search(**query).collect()

    def search_summaries(self, **query):
        for row in self.search(**query).toLocalIterator():
            yield row.asDict()

    def count(self, **query) -> int:
        return self.search(**query).count()

    def count_by_product(self, group_col: str = "lang", **query) -> DataFrame:
        return self.search(**query).groupBy(group_col).agg(F.count("*").alias("n"))

    def count_datasets_through_time(self, period: str = "1 day", ts_col: str = "warc_ts", **query) -> DataFrame:
        return (
            self.search(**query)
            .groupBy(F.window(F.col(ts_col), period).alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("bucket"), "n")
            .orderBy("bucket")
        )

    def get_product_time_bounds(self, ts_col: str = "warc_ts") -> Tuple:
        row = self._base().agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")).collect()[0]
        return (row["lo"], row["hi"])
