"""Tests: CLI expression grammar, Product/Measurement aliases, PageIndex API."""

import datetime

import pytest
from pyspark.sql import functions as F

from datacube_core_spark.catalog import PAGES_PRODUCT, Measurement, PageIndex, Product
from datacube_core_spark.plans.expression import parse_expressions
from datacube_core_spark.plans.query import Range

from .conftest import SF_TINY


def test_parse_expressions_grammar():
    out = parse_expressions("lang = en")
    assert out == {"lang": "en"}

    out = parse_expressions("doc_id in [10, 20]")
    assert out["doc_id"] == Range(10, 20)

    out = parse_expressions("time in 2014-03")
    assert out["time"].begin == datetime.datetime(2014, 3, 1)
    assert out["time"].end == datetime.datetime(2014, 3, 31, 23, 59, 59, 999999)

    out = parse_expressions("time in [2014-01, 2014-06]")
    assert out["time"].end == datetime.datetime(2014, 6, 30, 23, 59, 59, 999999)

    out = parse_expressions("time > 2020")
    assert out["time"].begin == datetime.datetime(2020, 1, 1)

    out = parse_expressions("time < 2020")
    assert out["time"].end == datetime.datetime(2020, 12, 31, 23, 59, 59, 999999)

    out = parse_expressions('name = "two words"', "lat in [-10.5, 10.5]")
    assert out["name"] == "two words"
    assert out["lat"] == Range(-10.5, 10.5)

    with pytest.raises(ValueError):
        parse_expressions("lang > en")


def test_measurement_alias_order():
    ms = PAGES_PRODUCT.lookup_measurements(["language", "content", "x"])
    assert [m.name for m in ms] == ["lang", "text", "lon"]
    assert [m.name for m in PAGES_PRODUCT.lookup_measurements()][:2] == ["doc_id", "url"]
    with pytest.raises(KeyError):
        PAGES_PRODUCT.lookup_measurements(["nope"])


def test_page_index_search(spark):
    idx = PageIndex(spark, SF_TINY)
    n_all = idx.count()
    assert n_all == 500

    en = idx.count(lang="en")
    assert 0 < en < n_all

    got = idx.search_returning(["doc_id", "language"], lang="en", limit=5)
    assert got.columns == ["doc_id", "lang"]
    assert got.count() == 5

    byp = {r["lang"]: r["n"] for r in idx.count_by_product().collect()}
    assert sum(byp.values()) == n_all

    lo, hi = idx.get_product_time_bounds()
    assert lo.year == 2024 and hi.year == 2024

    tt = idx.count_datasets_through_time(period="30 days")
    assert sum(r["n"] for r in tt.collect()) == n_all

    # spatial + expression-driven search
    from datacube_core_spark.plans.expression import parse_expressions

    terms = parse_expressions("lang = en", "lon in [-30, 30]")
    n = idx.count(**{k: (v if k == "time" else v) for k, v in terms.items()})
    exp = idx.search().where((F.col("lang") == "en") & F.col("lon").between(-30, 30)).count()
    assert n == exp


def test_page_index_search_kwargs_match_query_semantics(spark):
    idx = PageIndex(spark, SF_TINY)
    # Range term via tuple (2-sequence → Range)
    n = idx.count(doc_id=(100, 200))
    exp = idx.search().where(F.col("doc_id").between(100, 200)).count()
    assert n == exp


def test_search_cli_job(spark, capsys):
    """`datacube dataset search` analog: CLI expression grammar end to
    end through main()."""
    import json as _json

    from datacube_core_spark.__main__ import main

    rc = main(["--job", "search", "--sf-dir", SF_TINY,
               "--expr", "lang = en", "--limit", "7", "--repl", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("{")]
    summary = next(l for l in lines if "matched_shown" in l)
    assert _json.loads(summary)["matched_shown"] == 7
    rows = [_json.loads(l) for l in lines if '"lang"' in l]
    assert rows and all(r["lang"] == "en" for r in rows)
    assert all("html" not in r for r in rows)  # binary column dropped
