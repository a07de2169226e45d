"""Virtual-product RECIPE construction: dict/YAML → combinator tree.

ODC users define virtual products as YAML recipes, not Python (reference
``datacube/virtual/__init__.py:143-166`` ``construct``/``construct_from_yaml``,
``datacube/virtual/impl.py:914-928`` ``virtual_product_kind``).  This module
parses the same six node kinds into the existing ``plans/virtual.py``
combinator algebra — the recipe grammar is the reference's; the nodes it
builds are the Spark-first DataFrame builders:

* ``product``   → :class:`~.virtual.Product` leaf (named table factory)
* ``transform`` → named transformation (the reference's six built-ins —
  ``make_mask apply_mask to_float rename select expressions``,
  ``datacube/virtual/transformations.py``)
* ``collate`` / ``juxtapose`` → the union / join combinators
* ``aggregate`` → :class:`~.virtual.Aggregate` with a named ``group_by``
  (``year month week day``, reference ``transformations.py:year..day``)
* ``reproject`` → tile re-assignment on a target grid

Validation mirrors the reference's ``NameResolver._assert`` errors verbatim
(unknown/ambiguous kind, missing input, missing output_crs/resolution for
reproject, unresolvable names, duplicate registration), raising
:class:`VirtualProductError` (the ``VirtualProductException`` analog).
"""

from __future__ import annotations

import copy
import importlib
from collections.abc import Mapping
from typing import Any, Callable, Dict, Optional

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..geom.grid import GridSpec
from .query import flags_to_mask_value, make_mask_pred
from .virtual import (
    Aggregate,
    Collate,
    Juxtapose,
    Product,
    Reproject,
    Transform,
    VirtualProduct,
)

_KINDS = ("product", "transform", "collate", "juxtapose", "aggregate", "reproject")


class VirtualProductError(Exception):
    """Recipe validation error (reference ``VirtualProductException``)."""


def virtual_product_kind(recipe: Mapping[str, Any]) -> str:
    """One of product, transform, collate, juxtapose, aggregate, reproject
    (reference ``virtual/impl.py:914-923`` — same two error conditions)."""
    candidates = [key for key in recipe if key in _KINDS]
    if len(candidates) > 1:
        raise VirtualProductError(f"ambiguous kind in recipe: {recipe}")
    if len(candidates) < 1:
        raise VirtualProductError(f"virtual product kind not specified in recipe: {recipe}")
    return candidates[0]


class FnTransform(VirtualProduct):
    """A transformation node: arbitrary DataFrame→DataFrame function over
    the child's output (the relational ``Transformation.compute``,
    reference ``virtual/impl.py:434-478``)."""

    def __init__(self, child: VirtualProduct, fn: Callable[[DataFrame], DataFrame]):
        self.child = child
        self.fn = fn

    def build(self, spark, sf_dir):
        return self.fn(self.child.build(spark, sf_dir))


# ---------------------------------------------------------------------------
# built-in transformations (reference datacube/virtual/transformations.py)
# ---------------------------------------------------------------------------

def _t_expressions(child: VirtualProduct, params: Mapping[str, Any]) -> VirtualProduct:
    """``Expressions`` (reference ``transformations.py:319-396``): new
    measurements from formulas; ``output`` maps name → formula string or
    {formula: ...}; optional ``drop`` removes inputs afterwards."""
    output = params.get("output")
    if not output:
        raise VirtualProductError(f"no output for expressions in {params}")
    formulas = {
        name: (spec["formula"] if isinstance(spec, Mapping) else spec)
        for name, spec in output.items()
    }
    return Transform(child, formulas, drop=params.get("drop", ()))


def _t_rename(child: VirtualProduct, params: Mapping[str, Any]) -> VirtualProduct:
    """``Rename`` (reference ``transformations.py:219-271``)."""
    names = params.get("measurement_names")
    if not names:
        raise VirtualProductError(f"no measurement_names for rename in {params}")

    def fn(df: DataFrame) -> DataFrame:
        missing = [old for old in names if old not in df.columns]
        if missing:
            raise VirtualProductError(f"rename: measurements not in input: {missing}")
        for old, new in names.items():
            df = df.withColumnRenamed(old, new)
        return df

    return FnTransform(child, fn)


def _t_select(child: VirtualProduct, params: Mapping[str, Any]) -> VirtualProduct:
    """``Select`` (reference ``transformations.py:274-316``): keep only the
    listed measurements (column pruning — Catalyst pushes it to the scan)."""
    names = params.get("measurement_names")
    if not names:
        raise VirtualProductError(f"no measurement_names for select in {params}")

    def fn(df: DataFrame) -> DataFrame:
        missing = [c for c in names if c not in df.columns]
        if missing:
            raise VirtualProductError(f"select: measurements not in input: {missing}")
        return df.select(*names)

    return FnTransform(child, fn)


def _t_to_float(child: VirtualProduct, params: Mapping[str, Any]) -> VirtualProduct:
    """``ToFloat`` (reference ``transformations.py:158-216``): cast the
    targeted measurements to floating point; the nodata sentinel (if given)
    becomes NULL — the relational form of nodata→NaN."""
    apply_to = params.get("apply_to")
    dtype = params.get("dtype", "double")
    nodata = params.get("nodata")

    def fn(df: DataFrame) -> DataFrame:
        targets = apply_to if apply_to is not None else [
            c for c, t in df.dtypes if t in ("int", "bigint", "smallint", "tinyint", "float", "double")
        ]
        for c in targets:
            col = F.col(c)
            if nodata is not None:
                col = F.when(col == F.lit(nodata), F.lit(None)).otherwise(col)
            df = df.withColumn(c, col.cast(dtype))
        return df

    return FnTransform(child, fn)


def _t_make_mask(child: VirtualProduct, params: Mapping[str, Any]) -> VirtualProduct:
    """``MakeMask`` (reference ``transformations.py:48-80``): a boolean mask
    measurement from a bit-flag measurement.  Either named ``flags`` against
    inline ``flag_defs`` (the reference path, compiled by
    ``flags_to_mask_value``) or raw ``mask``/``value`` ints."""
    src = params.get("measurement")
    out_name = params.get("mask_measurement_name")
    if not src or not out_name:
        raise VirtualProductError(f"make_mask needs measurement and mask_measurement_name: {params}")
    if "flags" in params:
        flag_defs = params.get("flag_defs")
        if not flag_defs:
            raise VirtualProductError(f"make_mask flags given without flag_defs: {params}")
        mask, value = flags_to_mask_value(flag_defs, **params["flags"])
    else:
        try:
            mask, value = int(params["mask"]), int(params["value"])
        except KeyError as e:
            raise VirtualProductError(f"make_mask needs flags or mask/value: {params}") from e

    return FnTransform(child, lambda df: df.withColumn(out_name, make_mask_pred(F.col(src), mask, value)))


def _t_apply_mask(child: VirtualProduct, params: Mapping[str, Any]) -> VirtualProduct:
    """``ApplyMask`` (reference ``transformations.py:83-155``): NULL out the
    targeted measurements where the mask is false; drop the mask column
    unless ``preserve_mask``."""
    mask_name = params.get("mask_measurement_name")
    if not mask_name:
        raise VirtualProductError(f"no mask_measurement_name for apply_mask in {params}")
    apply_to = params.get("apply_to")
    preserve = bool(params.get("preserve_mask", False))

    def fn(df: DataFrame) -> DataFrame:
        if mask_name not in df.columns:
            raise VirtualProductError(f"apply_mask: mask {mask_name!r} not in input")
        targets = apply_to if apply_to is not None else [c for c in df.columns if c != mask_name]
        for c in targets:
            df = df.withColumn(c, F.when(F.col(mask_name), F.col(c)))
        return df if preserve else df.drop(mask_name)

    return FnTransform(child, fn)


# ---------------------------------------------------------------------------
# group_by buckets (reference transformations.py year/month/week/day)
# ---------------------------------------------------------------------------

def _bucket(unit: str) -> Callable[[Column], Column]:
    return lambda t: F.to_date(F.date_trunc(unit, t))


def _fiscal_year(t: Column) -> Column:
    """Reference Q-JUN fiscal year (``transformations.py:443-461``)."""
    from ..operators.grouping import time_bucket_col

    return time_bucket_col(t, "fiscal_year")


class _EarliestTime:
    """Sentinel for the reference ``earliest_time`` group_by
    (``transformations.py:477-479``): ONE bucket labeled with the year of
    the earliest observation — a global property, so it cannot be a pure
    per-row column; the aggregate factory grafts a broadcast 1-row
    cross-join carrying the min year instead of an all-rows window."""


EARLIEST_TIME = _EarliestTime()


def _agg_xarray_reduction(child: VirtualProduct, bucket, params: Mapping[str, Any]) -> VirtualProduct:
    aggs = params.get("output") or params.get("aggs")
    if not aggs:
        raise VirtualProductError(f"no output for xarray_reduction in {params}")
    time_col = params.get("time_col", "time")
    if isinstance(bucket, _EarliestTime):
        def attach_min_year(df: DataFrame, _tc=time_col) -> DataFrame:
            first = df.agg(
                F.min(F.to_date(F.date_trunc("year", F.col(_tc)))).alias("_bucket0")
            )
            return df.crossJoin(F.broadcast(first))

        child = FnTransform(child, attach_min_year)
        bucket = lambda t: F.col("_bucket0")  # noqa: E731
    return Aggregate(
        child,
        bucket=bucket,
        aggs=dict(aggs),
        time_col=time_col,
        extra_keys=params.get("extra_keys", ()),
    )


# ---------------------------------------------------------------------------
# leaf products: named table factories over the sf_dir parquet
# ---------------------------------------------------------------------------

def _table_leaf(table: str) -> Callable:
    return lambda spark, sf_dir: spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _pages_leaf(spark, sf_dir):
    from ..sources.pages import pages

    return pages(spark, sf_dir)


def _import_function(name: str):
    """Dotted-path fallback resolver (reference ``utils/__init__.py``
    ``import_function``): 'pkg.mod.fn' → the attribute."""
    module, _, attr = name.rpartition(".")
    if not module:
        raise ImportError(name)
    return getattr(importlib.import_module(module), attr)


class NameResolver:
    """Apply a mapping from names to callables in a recipe (reference
    ``virtual/__init__.py:22-115`` — same construct/validate flow, same
    registration rules)."""

    def __init__(self, lookup_table: Dict[str, Dict[str, Any]]):
        self.lookup_table = lookup_table

    def clone(self) -> "NameResolver":
        return NameResolver(copy.deepcopy(self.lookup_table))

    @staticmethod
    def _assert(cond, msg):
        if not cond:
            raise VirtualProductError(msg)

    def register(self, namespace: str, name: str, callable_obj) -> None:
        if namespace not in self.lookup_table:
            self.lookup_table[namespace] = {}
        if name in self.lookup_table[namespace]:
            raise VirtualProductError(f"name {name} under {namespace} is already registered")
        self.lookup_table[namespace][name] = callable_obj

    def _lookup(self, name, namespace: Optional[str], kind: str, recipe):
        if callable(name):
            return name
        table = self.lookup_table.get(namespace, {}) if namespace else {}
        if name in table:
            return table[name]
        try:
            result = _import_function(name)
        except (ImportError, AttributeError, TypeError):
            raise VirtualProductError(f"could not resolve {kind} {name} in {recipe}")
        self._assert(callable(result), f"{kind} not callable in {recipe}")
        return result

    def construct(self, **recipe) -> VirtualProduct:
        """Validate the recipe and construct the combinator tree."""
        get = recipe.get
        kind = virtual_product_kind(recipe)

        if kind == "product":
            fn = self._lookup(recipe["product"], "product", "product", recipe)
            where = get("where")
            select = get("select")

            def leaf(spark, sf_dir, _fn=fn, _where=where, _select=select):
                df = _fn(spark, sf_dir)
                if _where:
                    df = df.where(_where)
                if _select:
                    df = df.select(*_select)
                return df

            return Product(leaf)

        if kind == "transform":
            input_product = get("input")
            self._assert(input_product is not None, f"no input for transformation in {recipe}")
            factory = self._lookup(recipe["transform"], "transform", "transformation", recipe)
            child = self.construct(**input_product)
            params = {k: v for k, v in recipe.items() if k not in ("transform", "input")}
            return factory(child, params)

        if kind == "collate":
            self._assert(len(recipe["collate"]) > 0, f"no children for collate in {recipe}")
            children = [self.construct(**c) for c in recipe["collate"]]
            return Collate(
                children,
                index_measurement_name=get("index_measurement_name"),
                time_col=get("time_col", "time"),
                sort=bool(get("sort", False)),
            )

        if kind == "juxtapose":
            self._assert(len(recipe["juxtapose"]) > 0, f"no children for juxtapose in {recipe}")
            children = [self.construct(**c) for c in recipe["juxtapose"]]
            return Juxtapose(children, on=get("on", ("time",)))

        if kind == "aggregate":
            input_product = get("input")
            group_by = get("group_by")
            self._assert(input_product is not None, f"no input for aggregate in {recipe}")
            self._assert(group_by is not None, f"no group_by for aggregate in {recipe}")
            factory = self._lookup(recipe["aggregate"], "aggregate", "aggregate", recipe)
            bucket = self._lookup(group_by, "aggregate/group_by", "group_by", recipe)
            child = self.construct(**input_product)
            params = {k: v for k, v in recipe.items() if k not in ("aggregate", "input", "group_by")}
            return factory(child, bucket, params)

        if kind == "reproject":
            input_product = get("input")
            spec = recipe["reproject"]
            output_crs = spec.get("output_crs")
            resolution = spec.get("resolution")
            self._assert(input_product is not None, f"no input for reproject in {recipe}")
            self._assert(output_crs is not None, f"no output_crs for reproject in {recipe}")
            self._assert(resolution is not None, f"no resolution for reproject in {recipe}")
            tile_size = spec.get("tile_size", (4.0, 4.0))
            origin = spec.get("origin", (-90.0, -180.0))
            grid = GridSpec(
                crs=output_crs,
                tile_size=tuple(float(v) for v in tile_size),
                resolution=tuple(float(v) for v in resolution),
                origin=tuple(float(v) for v in origin),
            )
            child = self.construct(**input_product)
            return Reproject(child, grid, lon=spec.get("lon", "lon"), lat=spec.get("lat", "lat"))

        raise VirtualProductError(f"could not understand virtual product recipe: {recipe}")


DEFAULT_RESOLVER = NameResolver(
    {
        "transform": dict(
            make_mask=_t_make_mask,
            apply_mask=_t_apply_mask,
            to_float=_t_to_float,
            rename=_t_rename,
            select=_t_select,
            expressions=_t_expressions,
        ),
        "aggregate": dict(xarray_reduction=_agg_xarray_reduction),
        "aggregate/group_by": dict(
            year=_bucket("year"),
            month=_bucket("month"),
            week=_bucket("week"),
            day=_bucket("day"),
            fiscal_year=_fiscal_year,
            earliest_time=EARLIEST_TIME,
        ),
        "product": dict(
            pages=_pages_leaf,
            **{t: _table_leaf(t) for t in (
                "documents", "embeddings", "events", "region", "nation",
                "customer", "supplier", "part", "orders", "lineitem",
            )},
        ),
    }
)


def construct(name_resolver: Optional[NameResolver] = None, **recipe) -> VirtualProduct:
    """Create a virtual product from a specification dictionary
    (reference ``virtual/__init__.py:143-150``)."""
    if name_resolver is None:
        name_resolver = DEFAULT_RESOLVER
    return name_resolver.construct(**recipe)


def _fix_yaml_keys(node):
    """YAML 1.1 parses the bare keys ``on``/``off``/``yes``/``no`` as
    booleans; a juxtapose recipe legitimately uses ``on:`` for its join
    key, so map boolean KEYS back to their spelling recursively."""
    if isinstance(node, dict):
        return {
            ("on" if k is True else "off" if k is False else k): _fix_yaml_keys(v)
            for k, v in node.items()
        }
    if isinstance(node, list):
        return [_fix_yaml_keys(v) for v in node]
    return node


def construct_from_yaml(recipe: str, name_resolver: Optional[NameResolver] = None) -> VirtualProduct:
    """Create a virtual product from a YAML recipe
    (reference ``virtual/__init__.py:153-160``)."""
    return construct(name_resolver=name_resolver, **_fix_yaml_keys(yaml.safe_load(recipe)))


class Catalog(Mapping):
    """A catalog of named virtual products / unapplied transforms from one
    YAML document (reference ``virtual/catalog.py:30-75``): ``products``
    entries construct on lookup; ``transforms`` entries return a callable
    that grafts the transform onto a supplied input recipe."""

    def __init__(self, name_resolver: NameResolver, contents):
        if not isinstance(contents, Mapping):
            raise VirtualProductError(
                f"catalog document must be a mapping of products/transforms, got {type(contents).__name__}"
            )
        self.name_resolver = name_resolver
        self.contents = contents
        common = set(self._names("products")) & set(self._names("transforms"))
        if common:
            raise VirtualProductError(f"common names found in products and transforms {common}")

    def _names(self, section):
        return list(self.contents.get(section, {}))

    def __getitem__(self, name):
        if name in self._names("products"):
            return self.name_resolver.construct(**self.contents["products"][name]["recipe"])
        if name in self._names("transforms"):
            recipe = self.contents["transforms"][name]["recipe"]
            return lambda input_recipe: self.name_resolver.construct(**recipe, input=input_recipe)
        # reference parity: None, not KeyError (catalog.py:57 — "raising a
        # KeyError here stops autocompletion from working")
        return None

    def __contains__(self, name):
        # Mapping.__contains__ would probe __getitem__ for KeyError and
        # therefore claim EVERY name is present (getitem returns None for
        # unknowns, reference parity) — answer from the name lists instead
        return name in self._names("products") or name in self._names("transforms")

    def __len__(self):
        return len(self._names("products")) + len(self._names("transforms"))

    def __iter__(self):
        yield from self._names("products")
        yield from self._names("transforms")


def catalog_from_yaml(catalog_body: str, name_resolver: Optional[NameResolver] = None) -> Catalog:
    """Load a catalog of virtual products from a YAML document
    (reference ``virtual/__init__.py:163-170``)."""
    if name_resolver is None:
        name_resolver = DEFAULT_RESOLVER
    return Catalog(name_resolver, yaml.safe_load(catalog_body))
