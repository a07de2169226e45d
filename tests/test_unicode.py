"""Unicode NFC normalization: UDF parity, variant soundness, plan shape."""

import unicodedata

from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.functions.unicode import (
    DECOMPOSED_VARIANTS,
    decomposed_suffix_col,
    normalize_col,
)


def test_variants_are_what_they_claim():
    # 6 change under NFC, the last 2 are no-change controls
    changed = [unicodedata.normalize("NFC", v) != v for v in DECOMPOSED_VARIANTS]
    assert changed == [True] * 6 + [False, False]
    # composition targets are the documented precomposed points
    assert unicodedata.normalize("NFC", DECOMPOSED_VARIANTS[0]) == "é"
    assert unicodedata.normalize("NFC", DECOMPOSED_VARIANTS[4]) == "Å"
    assert unicodedata.normalize("NFC", DECOMPOSED_VARIANTS[5]) == "가"


def test_udf_matches_unicodedata(spark):
    cases = [
        "e\u0301e\u0301x",      # repeated combining sequences
        "A\u030a\u0301",        # stacked marks (ring then acute) -> U+01FA
        "\u212b\u212b",         # singleton twice
        "plain ascii",
        "",
        None,
        "\u1100\u1161\u11a8",   # jamo LVT triple -> single syllable U+AC01
    ]
    df = spark.createDataFrame(
        [Row(i=i, s=s) for i, s in enumerate(cases)], schema="i int, s string"
    )
    got = {
        r.i: r.n
        for r in df.select("i", normalize_col(F.col("s")).alias("n")).collect()
    }
    for i, s in enumerate(cases):
        want = unicodedata.normalize("NFC", s) if s is not None else None
        assert got[i] == want, (i, s)


def test_suffix_col_matches_python_indexing(spark):
    df = spark.range(0, 40).select(
        F.col("id"), decomposed_suffix_col(F.col("id")).alias("sfx")
    )
    for r in df.collect():
        assert r.sfx == DECOMPOSED_VARIANTS[r.id % len(DECOMPOSED_VARIANTS)]


def test_normalize_plan_is_arrow_vectorized(spark):
    df = spark.range(0, 10).select(
        normalize_col(F.col("id").cast("string")).alias("n")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_bad_form_raises():
    import pytest

    with pytest.raises(ValueError):
        normalize_col(F.lit("x"), form="NFX")
