"""ExtraDimensions: the optional 3rd dimension between (t) and (y, x).

API-parity port of reference ``datacube/model/__init__.py:928-1105``
(numpy instead of xarray for the coordinate store; slicing semantics —
including the ``searchsorted``-based ``coord_slice`` with its
``range[1] + 1`` stop rule — kept verbatim).  The Spark mapping per
SURVEY §1.1 is "one extra grouping column": :func:`explode_extra_dim`
attaches the sliced dimension as (index, value) columns via a literal
explode, after which it behaves like any other grouping/filter key.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Any, Dict, List, Mapping, Tuple, Union

import numpy as np


class ExtraDimensions:
    def __init__(self, extra_dim: Mapping[str, Any]):
        self._dims = dict(extra_dim)
        self._dim_slice: Dict[str, Tuple[int, int]] = {
            name: (0, len(dim["values"])) for name, dim in self._dims.items()
        }
        self._coords = {
            name: np.asarray(dim["values"], dtype=dim.get("dtype", "float64"))
            for name, dim in self._dims.items()
        }

    def has_empty_dim(self) -> bool:
        return any(len(v) == 0 for v in self._coords.values())

    def __getitem__(self, dim_slices: Dict[str, Union[float, Tuple[float, float]]]) -> "ExtraDimensions":
        unknown_keys = set(dim_slices.keys()) - set(self._dims.keys())
        if unknown_keys:
            raise KeyError(f"Found unknown keys {unknown_keys} in dim_slices")
        ed = ExtraDimensions(deepcopy(self._dims))
        ed._dim_slice = dict(self._dim_slice)
        resolved = {name: self.coord_slice(name, sl) for name, sl in dim_slices.items()}
        for dim_name, (i0, i1) in resolved.items():
            base = ed._dim_slice[dim_name]
            ed._dim_slice[dim_name] = (base[0] + i0, base[0] + i1)
            ed._dims[dim_name]["values"] = ed._dims[dim_name]["values"][i0:i1]
            ed._coords[dim_name] = ed._coords[dim_name][i0:i1]
        return ed

    @property
    def dims(self) -> Mapping[str, dict]:
        return self._dims

    @property
    def dim_slice(self) -> Mapping[str, Tuple[int, int]]:
        return self._dim_slice

    def measurements_values(self, dim: str) -> List[Any]:
        if dim not in self._dims:
            raise ValueError(f"Dimension {dim} not found.")
        return self._dims[dim]["values"]

    def measurements_slice(self, dim: str) -> slice:
        return slice(*self.measurements_index(dim))

    def measurements_index(self, dim: str) -> Tuple[int, int]:
        if dim not in self._dim_slice:
            raise ValueError(f"Dimension {dim} not found.")
        return self._dim_slice[dim]

    def index_of(self, dim: str, value: Any) -> int:
        if dim not in self._coords:
            raise ValueError(f"Dimension {dim} not found.")
        return int(np.searchsorted(self._coords[dim], value))

    def coord_slice(self, dim: str, coord_range: Union[float, Tuple[float, float]]) -> Tuple[int, int]:
        """Integer index range for a coordinate (min, max) range —
        reference's searchsorted + ``max + 1`` stop (``:1096-1108``)."""
        if isinstance(coord_range, (int, float)):
            coord_range = (coord_range, coord_range)
        start_index = self.index_of(dim, coord_range[0])
        stop_index = self.index_of(dim, coord_range[1] + 1)
        return start_index, stop_index

    def chunk_size(self) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
        names: Tuple[str, ...] = ()
        shapes: Tuple[int, ...] = ()
        for dim in self._dims.values():
            name = dim.get("name")
            names += (name,)
            shapes += (len(self.measurements_values(name)),)
        return names, shapes

    def __repr__(self) -> str:
        return f"ExtraDimensions(extra_dim={self._dims}, dim_slice={self._dim_slice})"


def explode_extra_dim(df, ed: ExtraDimensions, dim: str, index_col: str = None, value_col: str = None):
    """One output row per (input row × value in the dim's current slice):
    the extra dimension as ordinary (index, value) grouping columns.
    Index values are absolute (relative to the unsliced dimension), so
    slicing composes with downstream storage layout."""
    from pyspark.sql import functions as F

    index_col = index_col or f"{dim}_idx"
    value_col = value_col or dim
    vals = ed.measurements_values(dim)
    lo, _ = ed.measurements_index(dim)
    pairs = F.array(
        *[
            F.struct(F.lit(lo + i).alias(index_col), F.lit(v).alias(value_col))
            for i, v in enumerate(vals)
        ]
    )
    out = df.withColumn("_ed", F.explode(pairs))
    return out.select("*", f"_ed.{index_col}", f"_ed.{value_col}").drop("_ed")
