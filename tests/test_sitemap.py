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


def test_escape_guard_raises_when_escaping_disabled(spark):
    df = spark.createDataFrame(
        [Row(host=0, doc_id=0, url="https://x.example/?a=1&b=2")],
        "host int, doc_id int, url string",
    ).withColumn("warc_ts", F.timestamp_seconds(F.lit(0)))
    with pytest.raises(Exception, match="needs XML escaping"):
        build_sitemaps(df, escape=False).collect()


def test_build_escapes_and_parse_unescapes_specials(spark):
    nasty = "https://x.example/?a=1&b=<c>\"d'e&amp;f"
    df = spark.createDataFrame(
        [Row(host=0, doc_id=0, url=nasty)], "host int, doc_id int, url string"
    ).withColumn("warc_ts", F.timestamp_seconds(F.lit(0)))
    xml = build_sitemaps(df).collect()[0].xml
    assert "<loc>https://x.example/?a=1&amp;b=&lt;c&gt;&quot;d&apos;e&amp;amp;f</loc>" in xml
    got = parse_sitemaps(build_sitemaps(df)).collect()[0]
    assert got.loc == nasty


def test_xml_escape_roundtrip_vs_python_and_duckdb(spark):
    """Bijection fuzz: Spark escape == python reference, unescape inverts,
    and the DuckDB twin chain produces the same bytes."""
    import random
    from xml.sax.saxutils import escape as py_escape

    import duckdb

    from datacube_core_spark.sources.sitemap import (
        sql_xml_escape,
        sql_xml_unescape,
        xml_escape_col,
        xml_unescape_col,
    )

    rng = random.Random(42)
    alphabet = "ab&<>\"'&amp;&lt;;x "
    vals = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
            for _ in range(200)]
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(vals)])
    got = (
        df.select("i", xml_escape_col(F.col("s")).alias("e"),
                  xml_unescape_col(xml_escape_col(F.col("s"))).alias("rt"))
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        s = vals[r.i]
        assert r.e == py_escape(s, {'"': "&quot;", "'": "&apos;"})
        assert r.rt == s
        d_e, d_rt = con.execute(
            f"SELECT {sql_xml_escape('?')}, {sql_xml_unescape(sql_xml_escape('?'))}",
            [s, s],
        ).fetchone()
        assert d_e == r.e and d_rt == s


def test_sitemap_index_chunks_and_discovery(spark):
    from datacube_core_spark.sources.sitemap import (
        build_sitemap_chunks,
        build_sitemap_index,
        parse_sitemap_index,
    )

    df = _pages(spark, n=23, hosts=2)  # host0: 12 pages, host1: 11
    chunks = build_sitemap_chunks(df, max_urls=5)
    got = {(r.host, r.chunk): r for r in chunks.collect()}
    # host0 has ceil(12/5)=3 chunks, host1 ceil(11/5)=3
    assert sorted(got) == [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]
    assert got[(0, 0)].xml.count("<url>") == 5
    assert got[(0, 2)].xml.count("<url>") == 2  # 12 = 5+5+2
    assert got[(1, 2)].xml.count("<url>") == 1  # 11 = 5+5+1
    assert got[(0, 1)].sitemap_loc == "https://0/sitemap-1.xml"
    # chunking preserves global order: host0's docs are 0,2,...,22, so
    # chunk1 holds the 6th-10th (10..18) and not the 5th (8)
    assert "/p/10</loc>" in got[(0, 1)].xml and "/p/8</loc>" not in got[(0, 1)].xml
    idx = parse_sitemap_index(build_sitemap_index(chunks))
    rows = sorted((r.host, r.chunk, r.sitemap_loc) for r in idx.collect())
    assert rows == [(h, c, f"https://{h}/sitemap-{c}.xml")
                    for h in (0, 1) for c in (0, 1, 2)]
    with pytest.raises(ValueError):
        build_sitemap_chunks(df, max_urls=0)


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
