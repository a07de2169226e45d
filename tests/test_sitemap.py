"""sitemap.xml build/parse: round trip, ordering, escaping guard, plan."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.sources.sitemap import (
    build_sitemaps,
    parse_sitemaps,
    sitemap_entry_col,
)


def _pages(spark, n=10, hosts=3):
    rows = [Row(host=i % hosts, doc_id=i, url=f"https://s{i % hosts}.example/p/{i}")
            for i in range(n)]
    df = spark.createDataFrame(rows, "host int, doc_id int, url string")
    return df.withColumn(
        "warc_ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 86400)
    )


def test_roundtrip_order_and_fields(spark):
    df = _pages(spark)
    out = parse_sitemaps(build_sitemaps(df)).collect()
    assert len(out) == 10
    want = {r.url: r for r in df.collect()}
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
        src = want[r.loc]
        assert src.host == r.host
        assert r.lastmod == src.warc_ts.strftime("%Y-%m-%d")
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r.pos)
        assert [r.pos for r in rows] == list(range(len(rows)))
        ids = [int(r.loc.rsplit("/", 1)[1]) for r in rows]
        assert ids == sorted(ids)  # in-document order = doc_id order


def test_xml_shape_reference(spark):
    df = _pages(spark, n=2, hosts=1)
    (xml,) = [r.xml for r in build_sitemaps(df).collect()]
    assert xml == (
        "<urlset>"
        "<url><loc>https://s0.example/p/0</loc><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://s0.example/p/1</loc><lastmod>2024-01-02</lastmod></url>"
        "</urlset>"
    )


def test_escape_guard_raises(spark):
    df = spark.createDataFrame(
        [Row(host=0, doc_id=0, url="https://x.example/?a=1&b=2")],
        "host int, doc_id int, url string",
    ).withColumn("warc_ts", F.timestamp_seconds(F.lit(0)))
    with pytest.raises(Exception, match="needs XML escaping"):
        build_sitemaps(df).collect()


def test_empty_sitemap_parses_to_nothing(spark):
    maps = spark.createDataFrame(
        [Row(host=0, xml="<urlset></urlset>")], "host int, xml string"
    )
    assert parse_sitemaps(maps).count() == 0


def test_plans_pure_jvm(spark):
    df = _pages(spark)
    plan = (
        parse_sitemaps(build_sitemaps(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
