"""URL canonicalization edge cases (functions/url.py)."""

from pyspark.sql import functions as F

from datacube_core_spark.functions.url import (
    canonical_url_col,
    domain_col,
    host_col,
    strip_tracking_col,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    return [
        r["c"]
        for r in df.select(canonical_url_col(F.col("url")).alias("c")).collect()
    ]


def test_canonicalization_cases(spark):
    cases = {
        # scheme + www + host case + trailing slash
        "http://WWW.Site.COM/Page/": "https://site.com/Page",
        # utm stripped, real params kept, order preserved
        "https://a.com/p?utm_source=x&q=1": "https://a.com/p?q=1",
        "https://a.com/p?q=1&utm_campaign=z": "https://a.com/p?q=1",
        "https://a.com/p?utm_a=1&utm_b=2": "https://a.com/p",
        # fragment stripped
        "https://a.com/p#section": "https://a.com/p",
        # path case PRESERVED (only host lowercased)
        "https://A.com/CaseSensitive": "https://a.com/CaseSensitive",
        # already-canonical is a fixed point
        "https://a.com/p?q=1": "https://a.com/p?q=1",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())
    # idempotence: canon(canon(u)) == canon(u)
    again = _canon(spark, got)
    assert again == got


def test_host_and_domain(spark):
    df = spark.createDataFrame(
        [("https://www.Sub.News.Example.co/p",), ("http://plain.org/x?y=1",)], "url STRING"
    )
    rows = df.select(
        host_col(F.col("url")).alias("h"), domain_col(F.col("url")).alias("d")
    ).collect()
    assert (rows[0]["h"], rows[0]["d"]) == ("sub.news.example.co", "example.co")
    assert (rows[1]["h"], rows[1]["d"]) == ("plain.org", "plain.org")


def test_strip_tracking_separator_cleanup(spark):
    df = spark.createDataFrame(
        [("https://a.com/p?utm_x=1",), ("https://a.com/p?utm_x=1&utm_y=2&k=v",)], "url STRING"
    )
    got = [r["s"] for r in df.select(strip_tracking_col(F.col("url")).alias("s")).collect()]
    assert got == ["https://a.com/p", "https://a.com/p?k=v"]


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([("https://a.com/p",)], "url STRING").select(
        canonical_url_col(F.col("url")).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_sql_twins_match_spark_on_adversarial_urls(spark):
    """Cross-engine parity on inputs the entry corpus does NOT cover
    (code-review r4 finding: DuckDB regexp_replace is first-match-only
    without 'g' — a 2+-utm url diverged)."""
    import duckdb

    from datacube_core_spark.functions.url import (
        sql_canonical_url,
        sql_domain,
        sql_host,
    )

    urls = [
        "https://a.com/p?utm_x=1&utm_y=2&k=v",        # two utm params
        "https://a.com/p?utm_a=1&utm_b=2&utm_c=3",    # three, nothing left
        "http://WWW.Sub.Site.COM/Path/?utm_s=x#f",    # everything at once
        "https://plain.org/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    got = [
        (r["c"], r["h"], r["d"])
        for r in df.select(
            canonical_url_col(F.col("url")).alias("c"),
            host_col(F.col("url")).alias("h"),
            domain_col(F.col("url")).alias("d"),
        ).collect()
    ]
    con = duckdb.connect()
    exp = []
    for u in urls:
        row = con.execute(
            f"SELECT {sql_canonical_url('u')}, {sql_host('u')}, {sql_domain('u')} "
            f"FROM (SELECT ? AS u)", [u]
        ).fetchone()
        exp.append(tuple(row))
    assert got == exp


def test_utm_stripping_is_param_anchored(spark):
    """Review-pass-2 finding: 'utm_' inside a param VALUE or a non-utm
    NAME must survive; consecutive utm params must all go (the old
    substring regex failed both)."""
    import duckdb

    from datacube_core_spark.functions.url import sql_canonical_url

    cases = {
        "https://site.com/?q=utm_test&page=2": "https://site.com/?q=utm_test&page=2",
        "https://site.com/?xutm_a=1&b=2": "https://site.com/?xutm_a=1&b=2",
        "https://a.com/p?utm_a=1&utm_b=2&utm_c=3&k=v": "https://a.com/p?k=v",
        "https://a.com/p?utm_a=1&k=v&utm_b=2": "https://a.com/p?k=v",
        "https://a.com/p?": "https://a.com/p",
        "https://a.com/p?k=v&": "https://a.com/p?k=v",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())
    # DuckDB twin agrees on every case
    con = duckdb.connect()
    for u, want in cases.items():
        row = con.execute(f"SELECT {sql_canonical_url('u')} FROM (SELECT ? AS u)", [u]).fetchone()
        assert row[0] == want, (u, row[0])
