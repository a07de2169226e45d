"""Spatial extent reporting: exact vector union of dataset footprints.

Reference: the postgis driver's ``ST_Union`` extent aggregation
(``drivers/postgis/_api.py:387-400``) and ``get_bounds``
(``api/core.py:983-985``).  Spark shape per SURVEY §2.4: group →
``applyInPandas`` aggregate that unions the packed geometries with the
exact arrangement-based boolean kernel (``geom.boolean.unary_union``) —
no shapely needed.  The per-group geometry count is assumed
aggregate-sized (footprint tables, not the big side); the big-data path
for coverage questions remains the covering-cell union in the PIP index.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geom.boolean import multipolygon_area, unary_union
from ..geom.polygon import multipolygon_bbox, pack_multipolygon, unpack_multipolygon


def spatial_extent_union(
    df: DataFrame,
    geom_col: str = "geom",
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact union of packed multipolygon footprints, per group (or one
    global row with ``group_cols=None``).

    Returns (group_cols..., extent BINARY packed multipolygon,
    area DOUBLE, left/bottom/right/top DOUBLE bbox)."""
    gcols: List[str] = list(group_cols) if group_cols else []
    src = df.select(*gcols, geom_col) if gcols else df.select(F.lit(0).alias("_g"), geom_col)
    keys = gcols or ["_g"]

    def fuse(pdf: pd.DataFrame) -> pd.DataFrame:
        mps = [unpack_multipolygon(bytes(b)) for b in pdf[geom_col]]
        u = unary_union(mps)
        l, b, r, t = multipolygon_bbox(u)
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update(
            extent=bytearray(pack_multipolygon(u)),
            area=multipolygon_area(u),
            left=l, bottom=b, right=r, top=t,
        )
        return pd.DataFrame([row])

    key_schema = ", ".join(f"{k} {t}" for k, t in src.select(*keys).dtypes)
    schema = (
        f"{key_schema}, extent BINARY, area DOUBLE, "
        "left DOUBLE, bottom DOUBLE, right DOUBLE, top DOUBLE"
    )
    out = src.groupBy(*keys).applyInPandas(fuse, schema=schema)
    return out.drop("_g") if not gcols else out
