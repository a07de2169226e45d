"""ExtraDimensions parity (reference model/__init__.py:928-1105) + the
Spark grouping-column mapping."""

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.model_dims import ExtraDimensions, explode_extra_dim


def _ed():
    return ExtraDimensions(
        {"z": {"name": "z", "values": [5, 10, 15, 20, 25], "dtype": "float64"}}
    )


def test_slicing_and_indexing():
    ed = _ed()
    assert ed.measurements_index("z") == (0, 5)
    assert not ed.has_empty_dim()
    assert ed.index_of("z", 15) == 2

    sub = ed[{"z": (10, 20)}]
    assert sub.measurements_values("z") == [10, 15, 20]
    assert sub.measurements_index("z") == (1, 4)
    assert sub.measurements_slice("z") == slice(1, 4)
    # original untouched
    assert ed.measurements_values("z") == [5, 10, 15, 20, 25]

    # nested slicing composes absolutely
    sub2 = sub[{"z": (15, 15)}]
    assert sub2.measurements_values("z") == [15]
    assert sub2.measurements_index("z") == (2, 3)

    # scalar slice
    one = ed[{"z": 20}]
    assert one.measurements_values("z") == [20]

    # empty result
    empty = ed[{"z": (26, 30)}]
    assert empty.has_empty_dim()

    assert ed.chunk_size() == (("z",), (5,))
    with pytest.raises(KeyError):
        ed[{"w": (0, 1)}]
    with pytest.raises(ValueError):
        ed.measurements_values("w")


def test_explode_extra_dim_grouping_column(spark):
    ed = _ed()[{"z": (10, 20)}]
    df = spark.createDataFrame([(1,), (2,)], "doc_id LONG")
    out = explode_extra_dim(df, ed, "z")
    rows = {(int(r["doc_id"]), int(r["z_idx"]), float(r["z"])) for r in out.collect()}
    assert rows == {
        (1, 1, 10.0), (1, 2, 15.0), (1, 3, 20.0),
        (2, 1, 10.0), (2, 2, 15.0), (2, 3, 20.0),
    }
    # behaves as an ordinary grouping key
    g = out.groupBy("z_idx").agg(F.count("*").alias("n")).collect()
    assert {int(r["z_idx"]): int(r["n"]) for r in g} == {1: 2, 2: 2, 3: 2}
