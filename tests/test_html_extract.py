"""HTML → text extraction: the north rule's byte-identity invariant.

Three independent implementations of the extractor are cross-checked:
the Catalyst column chain (functions/html.extract_text_col), the DuckDB
SQL twin (sql_extract_text), and a pure-Python re.sub reference
(py_extract_text).  The headline assertion is per-url byte identity of
the extracted text against the source text column over the full tiny-SF
pages table.
"""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.functions.html import (
    escape_html_col,
    extract_text_col,
    py_extract_text,
    sql_extract_text,
    unescape_html_col,
)
from datacube_core_spark.sources.pages import pages, pages_cte, sql_html_expr

from .conftest import SF_TINY

TRICKY = [
    "plain words only",
    "a < b & b > c",
    'quotes "double" and \'single\'',
    "pre-escaped looking &amp;lt; stays literal",
    "trailing ampersand & and angle <",
    "",
]


def test_escape_unescape_roundtrip(spark):
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(TRICKY)])
    out = df.select(
        "i", "t", unescape_html_col(escape_html_col(F.col("t"))).alias("rt")
    ).collect()
    for r in out:
        assert r.rt == r.t, f"roundtrip broke: {r.t!r} -> {r.rt!r}"


def test_extractor_drops_boilerplate_keeps_paragraphs(spark):
    html = (
        "<html><head><title>BOILER</title>"
        "<style>p{x:1}</style>"
        '<script>if(1<2){var s="</p fake>";}</script>'
        "</head><body><!-- hidden < comment -->"
        "<h1>HEADING</h1>"
        '<p class="a">first <b>bold</b> para &amp; more</p>'
        "<nav><a href='/x'>NAVLINK</a></nav>"
        "<p>second &lt;p&gt; para</p>"
        "</body></html>"
    ).encode("utf-8")
    expected = "first bold para & more\n\nsecond <p> para"
    assert py_extract_text(html) == expected
    got = (
        spark.createDataFrame([Row(h=bytearray(html))])
        .select(extract_text_col(F.col("h")).alias("e"))
        .collect()[0]
        .e
    )
    assert got == expected
    for bad in ("BOILER", "HEADING", "NAVLINK", "fake", "hidden"):
        assert bad not in got
    sql_got = duckdb.sql(
        f"SELECT {sql_extract_text('h')} AS e FROM (SELECT ?::VARCHAR AS h)",
        params=[html.decode("utf-8")],
    ).fetchone()[0]
    assert sql_got == expected


def test_byte_identity_full_table(spark):
    """North-rule invariant: extracted text is byte-identical to the text
    column for EVERY url in the synthetic pages table."""
    p = pages(spark, SF_TINY, repl=4)
    ext = extract_text_col(F.col("html"))
    bad, total = (
        p.select(
            F.sum((ext != F.col("text")).cast("int")).alias("bad"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    assert total > 0
    assert bad == 0, f"{bad}/{total} pages broke byte identity"


def test_byte_identity_vs_python_reference(spark):
    """Decode the actual html BYTES driver-side with the independent
    pure-Python extractor and compare raw bytes per url."""
    rows = (
        pages(spark, SF_TINY, repl=1)
        .select("url", "html", "text")
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    assert len(rows) == 40
    for r in rows:
        assert py_extract_text(bytes(r.html)).encode("utf-8") == r.text.encode("utf-8"), r.url


def test_sql_twin_matches_spark_on_corpus(spark):
    p = pages(spark, SF_TINY, repl=1)
    ext = extract_text_col(F.col("html"))
    spark_fp = {
        r.doc_id: r.fp
        for r in p.select(
            "doc_id", F.md5(F.encode(ext, "UTF-8")).alias("fp")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_TINY}/documents.parquet')"
    )
    sql = f"""{pages_cte(1)},
m AS (SELECT doc_id, {sql_html_expr()} AS h FROM pages)
SELECT doc_id, md5({sql_extract_text('h')}) AS fp FROM m
"""
    duck_fp = dict(con.execute(sql).fetchall())
    assert duck_fp == spark_fp


def _fuzz_texts(n=120):
    """Deterministic adversarial corpus: entity look-alikes, literal tags,
    unicode, whitespace variants — everything the escape→extract round
    trip must survive byte-exactly."""
    import random

    rng = random.Random(20260817)
    frags = [
        "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&", "<", ">", '"', "'",
        "<p>", "</p>", "<script>", "</script>", "<!--", "-->", "plain",
        "wörds", "中文字", "🙂", "é", "\n", "\r\n", "\t", "  ", "a&b<c>d",
        "&amp;lt;", "&&&", "<<>>", "x" * 50,
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        out.append("".join(rng.choice(frags) for _ in range(k)))
    return out


def test_fuzz_roundtrip_spark_and_duckdb(spark):
    """escape(text) embedded in the full page template, extracted back:
    byte identity must hold for arbitrary text in BOTH engines."""
    texts = _fuzz_texts()
    rows = [Row(i=i, t=t) for i, t in enumerate(texts)]
    html = F.concat(
        F.lit('<html><head><title>x</title><script>if(1<2){var q="&";}</script>'
              '</head><body><!-- c --><h1>h</h1><p class="m">'),
        escape_html_col(F.col("t")),
        F.lit('</p><a href="u">n</a></body></html>'),
    )
    got = (
        spark.createDataFrame(rows)
        .select("i", "t", extract_text_col(F.encode(html, "UTF-8")).alias("e"))
        .collect()
    )
    for r in got:
        assert r.e == r.t, f"spark roundtrip broke on {r.t!r}"
    from datacube_core_spark.functions.html import sql_escape_html

    con = duckdb.connect()
    con.execute("CREATE TABLE txts (i INT, t VARCHAR)")
    con.executemany("INSERT INTO txts VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)])
    h = ("'<html><head><title>x</title><script>if(1<2){var q=\"&\";}</script>"
         "</head><body><!-- c --><h1>h</h1><p class=\"m\">' || "
         f"{sql_escape_html('t')} || '</p><a href=\"u\">n</a></body></html>'")
    bad = con.execute(
        f"SELECT count(*) FROM txts WHERE {sql_extract_text(h)} <> t"
    ).fetchone()[0]
    assert bad == 0


def test_extraction_is_catalyst_only(spark):
    plan = (
        pages(spark, SF_TINY, repl=1)
        .select(extract_text_col(F.col("html")).alias("e"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_anchor_pairs_position_aligned(spark):
    """anchor_hrefs_col / anchor_texts_col run the same pattern, so index
    i of both arrays describes the same <a>; inner markup is stripped and
    entities decoded in the text."""
    import duckdb

    from datacube_core_spark.functions.html import (
        anchor_hrefs_col,
        anchor_texts_col,
        sql_anchor_hrefs,
        sql_anchor_texts,
    )
    from pyspark.sql import functions as F

    html = (
        '<a class="n" href="/a">One</a> junk '
        '<a href="b/c"><b>Two</b> &amp; <i>half</i></a>'
        '<a href="#x">skip-me-not</a>'
        '<a rel="no" href="https://z.example/q">  Z  </a>'
    )
    df = spark.createDataFrame([(html.encode(),)], "html BINARY")
    row = df.select(
        anchor_hrefs_col(F.col("html")).alias("h"),
        anchor_texts_col(F.col("html")).alias("t"),
    ).collect()[0]
    assert row["h"] == ["/a", "b/c", "#x", "https://z.example/q"]
    assert row["t"] == ["One", "Two & half", "skip-me-not", "Z"]
    con = duckdb.connect()
    dh, dt = con.execute(
        f"SELECT {sql_anchor_hrefs('v')}, {sql_anchor_texts('v')} "
        "FROM (SELECT ? AS v)", [html]
    ).fetchone()
    assert dh == row["h"] and dt == row["t"]
