"""Virtual-product combinator algebra as DataFrame builders.

The reference's composable dataflow DSL (``datacube/virtual/impl.py``)
has six node kinds (``virtual_product_kind``, ``impl.py:914-928``); each
maps 1:1 onto a DataFrame expression tree (SURVEY §2.7) — Catalyst is the
planner the reference lacks:

* ``product``   (leaf, ``impl.py:313-431``)  → base DataFrame factory
* ``transform`` (``impl.py:434-478``)        → withColumn / formula map
* ``collate``   (``impl.py:558-669``)        → unionByName + provenance
  index column (``index_measurement_name``) + orderBy(time)
* ``juxtapose`` (``impl.py:672-742``)        → inner join on the shared
  key; measurement-name collision is an error (``impl.py:690-693``)
* ``aggregate`` (``impl.py:481-555``)        → groupBy(bucket).agg
* ``reproject``                              → grid re-assignment (tile
  indices recomputed on a target GridSpec)

Each node's ``build(spark, sf_dir) -> DataFrame`` constructs the plan
lazily; nothing executes until an action.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expr import compile_formula
from ..geom.grid import GridSpec
from ..operators.tiling import with_tile


class VirtualProduct:
    def build(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        raise NotImplementedError


class Product(VirtualProduct):
    """Leaf: a DataFrame factory (query+group+fetch of one product)."""

    def __init__(self, fn: Callable[[SparkSession, str], DataFrame]):
        self.fn = fn

    def build(self, spark, sf_dir):
        return self.fn(spark, sf_dir)


class Transform(VirtualProduct):
    """Map measurements: new columns from formulas over existing ones."""

    def __init__(self, child: VirtualProduct, formulas: Dict[str, str], drop: Sequence[str] = ()):
        self.child = child
        self.formulas = formulas
        self.drop = list(drop)

    def build(self, spark, sf_dir):
        df = self.child.build(spark, sf_dir)
        env = {c: F.col(c) for c in df.columns}
        for name, formula in self.formulas.items():
            df = df.withColumn(name, compile_formula(formula, env))
        return df.drop(*self.drop)


class Collate(VirtualProduct):
    """Union-all of same-schema children stacked along time; optional
    provenance column records which child produced each row.

    The reference sorts the concatenated result along time
    (``virtual/impl.py:617,663``) — but it sorts an in-memory xarray; at
    scale a collate-then-aggregate plan must NOT pay a global
    range-partition sort for ordering the consumer never uses.  So the
    sort is OPT-IN (``sort=True``); the default plan is a pure union with
    no exchange.  Consumers that need per-group order (the fuser) already
    sort within their own window/aggregation.
    """

    def __init__(
        self,
        children: Sequence[VirtualProduct],
        index_measurement_name: Optional[str] = None,
        time_col: str = "time",
        sort: bool = False,
    ):
        self.children = list(children)
        self.index_name = index_measurement_name
        self.time_col = time_col
        self.sort = sort

    def build(self, spark, sf_dir):
        dfs = [c.build(spark, sf_dir) for c in self.children]
        cols = set(dfs[0].columns)
        for d in dfs[1:]:
            if set(d.columns) != cols:
                raise ValueError("collate requires identical measurement sets")
        if self.index_name:
            dfs = [d.withColumn(self.index_name, F.lit(i)) for i, d in enumerate(dfs)]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        if self.sort and self.time_col in out.columns:
            out = out.orderBy(self.time_col)
        return out


class Juxtapose(VirtualProduct):
    """Column-wise join of different-measurement children on a shared key
    (the reference aligns on the time coordinate, inner)."""

    def __init__(self, children: Sequence[VirtualProduct], on: Sequence[str] = ("time",)):
        self.children = list(children)
        self.on = list(on)

    def build(self, spark, sf_dir):
        dfs = [c.build(spark, sf_dir) for c in self.children]
        seen: set = set()
        for d in dfs:
            measurements = set(d.columns) - set(self.on)
            clash = seen & measurements
            if clash:
                raise ValueError(f"juxtapose measurement collision: {sorted(clash)}")
            seen |= measurements
        out = dfs[0]
        for d in dfs[1:]:
            out = out.join(d, on=self.on, how="inner")
        return out


class Aggregate(VirtualProduct):
    """Grouped statistic along time: bucket the time column, aggregate
    named measurements (XarrayReduction analog: mean/min/max/sum/...)."""

    _STATS = {
        "mean": F.mean, "min": F.min, "max": F.max, "sum": F.sum,
        "std": F.stddev_samp, "var": F.var_samp, "median": F.median,
        "count": F.count, "first": F.first, "last": F.last,
    }

    def __init__(
        self,
        child: VirtualProduct,
        bucket: Callable[[Column], Column],
        aggs: Dict[str, str],
        time_col: str = "time",
        extra_keys: Sequence[str] = (),
    ):
        self.child = child
        self.bucket = bucket
        self.aggs = aggs
        self.time_col = time_col
        self.extra_keys = list(extra_keys)

    def build(self, spark, sf_dir):
        df = self.child.build(spark, sf_dir)
        keyed = df.withColumn("_bucket", self.bucket(F.col(self.time_col)))
        exprs = [self._STATS[stat](F.col(col)).alias(f"{col}_{stat}") for col, stat in self.aggs.items()]
        return (
            keyed.groupBy("_bucket", *self.extra_keys)
            .agg(*exprs)
            .withColumnRenamed("_bucket", self.time_col)
        )


class Reproject(VirtualProduct):
    """Re-assign tile indices on a target GridSpec (the relational analog
    of the reference's on-the-fly warp: spatial columns recomputed on the
    target grid; pixel-level resampling lives in operators/raster.py)."""

    def __init__(self, child: VirtualProduct, grid: GridSpec, lon: str = "lon", lat: str = "lat"):
        self.child = child
        self.grid = grid
        self.lon = lon
        self.lat = lat

    def build(self, spark, sf_dir):
        df = self.child.build(spark, sf_dir)
        return with_tile(df.drop("tile_x", "tile_y"), self.grid, lon=self.lon, lat=self.lat)


class ReprojectRasters(VirtualProduct):
    """Pixel-level reproject combinator: the child must yield per-tile
    rasters (tile_x, tile_y, region_id, h, w, raster) on ``src_grid``;
    output is the warped rasters on ``dst_grid`` — the reference's
    on-the-fly warp node (``virtual/impl.py:745-911``), here backed by the
    distributed warp operator (``operators/warp.py``) with any of the 13
    resampling modes."""

    def __init__(
        self,
        child: VirtualProduct,
        src_grid: GridSpec,
        src_res: float,
        dst_grid: GridSpec,
        dst_res: float,
        regions_df_fn=None,
        resampling: str = "nearest",
    ):
        self.child = child
        self.src_grid = src_grid
        self.src_res = src_res
        self.dst_grid = dst_grid
        self.dst_res = dst_res
        self.regions_df_fn = regions_df_fn
        self.resampling = resampling

    def build(self, spark, sf_dir):
        from ..operators.warp import merc_region_tiles, warp_rasters_to_grid

        rasters = self.child.build(spark, sf_dir)
        if self.regions_df_fn is None:
            from ..sources.regions import regions as _regions

            regs = _regions(spark)
        else:
            regs = self.regions_df_fn(spark, sf_dir)
        cand = merc_region_tiles(regs, self.dst_grid)
        return warp_rasters_to_grid(
            rasters, self.src_grid, self.src_res, self.dst_grid, self.dst_res, cand, self.resampling
        )
