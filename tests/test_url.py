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


# ---------------------------------------------------------------------------
# RFC 3986 relative-reference resolution (resolve_url_col and twins)
# ---------------------------------------------------------------------------

RESOLVE_CASES = [
    # (base, href, expected) — expected None = non-crawlable per contract
    ("http://a.example/b/c", "http://x.example/d/../e", "http://x.example/d/../e"),
    ("http://a.example/b/c", "//x.example/d/../e", "http://x.example/d/../e"),
    ("http://a.example/b/c", "/d/./f/../g", "http://a.example/d/g"),
    ("http://a.example/b/c", "d/../g", "http://a.example/b/g"),
    ("http://a.example/b/c", "../../../g", "http://a.example/g"),
    ("http://a.example/b/c", "?q=1", "http://a.example/b/c?q=1"),
    ("http://a.example/b/c", "#f", None),
    ("http://a.example/b/c", "", None),
    ("http://a.example/b/c", "?", None),
    ("http://a.example", "d/e", "http://a.example/d/e"),
    ("http://a.example", "?q=1", "http://a.example?q=1"),
    ("http://a.example/b/c?old=1", "?new=2", "http://a.example/b/c?new=2"),
    ("http://a.example/b/c?old=1", "d", "http://a.example/b/d"),
    ("http://a.example/b/", "g#frag", "http://a.example/b/g"),
    ("http://a.example/b/c", "g/", "http://a.example/b/g/"),
    ("http://a.example/b/c", "./", "http://a.example/b/"),
    ("http://a.example/b/c", "..", "http://a.example/"),
    ("http://a.example/b/c/d", "...", "http://a.example/b/c/..."),
    ("http://a.example/b/c", "g?y/./x", "http://a.example/b/g?y/./x"),
    ("http://a.example/b/c", "g?", "http://a.example/b/g"),
    ("http://a.example/b/c", "g?y?", "http://a.example/b/g?y?"),
    ("http://a.example/b/c", "javascript:void(0)", None),
    ("http://a.example/b/c", "mailto:x@y", None),
    ("http://a.example/b/c", "HTTPS://UP.example/Z", "HTTPS://UP.example/Z"),
    ("http://a.example/x/y/z/w", "../../../../../q", "http://a.example/q"),
    ("http://a.example/b/c", ".x/../g", "http://a.example/b/g"),
    ("http://a.example/b/c", "..a/../g", "http://a.example/b/g"),
]


def test_resolve_url_hand_cases(spark):
    """All three implementations agree on the branch-sweep hand cases."""
    import duckdb

    from datacube_core_spark.functions.url import (
        py_resolve_url,
        resolve_url_col,
        sql_resolve_url,
    )

    for b, h, want in RESOLVE_CASES:
        assert py_resolve_url(b, h) == want, ("py", b, h)
    df = spark.createDataFrame(
        [(b, h) for b, h, _ in RESOLVE_CASES], "b STRING, h STRING"
    )
    got = [
        r["r"]
        for r in df.select(
            resolve_url_col(F.col("b"), F.col("h")).alias("r")
        ).collect()
    ]
    assert got == [w for _, _, w in RESOLVE_CASES]
    con = duckdb.connect()
    for b, h, want in RESOLVE_CASES:
        row = con.execute(
            f"SELECT {sql_resolve_url('b', 'h')} FROM (SELECT ? AS b, ? AS h)",
            [b, h],
        ).fetchone()
        assert row[0] == want, ("duckdb", b, h, row[0])


def _resolve_fuzz_pairs(n=400):
    """Seeded (base, href) generator sweeping the branch space with
    dot-segment nesting within the DOT_SEGMENT_PASSES bound."""
    import random

    r = random.Random(0xF3986)
    schemes = ["http://", "https://"]
    hosts = ["a.example", "b.test", "sub.c.example"]
    segs = ["a", "b", "cc", "d1", ".x", "..y", "...", "p%20q", "img.png"]

    def rand_path(maxlen=4, dotp=0.35):
        k = r.randint(0, maxlen)
        return "/".join(
            r.choice([".", ".."]) if r.random() < dotp else r.choice(segs)
            for _ in range(k)
        )

    out = []
    for _ in range(n):
        bp = "/" + rand_path(3, 0.0)
        if r.random() < 0.2:
            bp = ""
        base = (
            r.choice(schemes) + r.choice(hosts) + bp
            + (("?bq=" + str(r.randint(0, 9))) if r.random() < 0.3 else "")
        )
        shape = r.random()
        if shape < 0.12:
            href = r.choice(schemes) + r.choice(hosts) + "/" + rand_path()
        elif shape < 0.2:
            href = "//" + r.choice(hosts) + "/" + rand_path()
        elif shape < 0.35:
            href = "/" + rand_path()
        elif shape < 0.45:
            href = "?" + r.choice(["", "q=1", "a=b&c=d", "y/./x"])
        elif shape < 0.5:
            href = r.choice([
                "#f", "", "#", "javascript:void(0)", "mailto:x@y",
                "data:text/plain,hi", "ftp://x/y",
            ])
        else:
            href = rand_path(5)
        if r.random() < 0.3:
            href += r.choice(["#f", "#a/b", "#?"])
        if r.random() < 0.15:
            href += "?"
        out.append((base, href))
    return out


def test_resolve_url_fuzz_three_engines(spark):
    """Seeded fuzz: Catalyst == DuckDB twin == urllib.parse.urljoin-backed
    reference on every generated (base, href) — the stdlib RFC 3986
    resolver shares no code with either engine expression."""
    import duckdb

    from datacube_core_spark.functions.url import (
        py_resolve_url,
        resolve_url_col,
        sql_resolve_url,
    )

    pairs = _resolve_fuzz_pairs()
    exp = [py_resolve_url(b, h) for b, h in pairs]
    df = spark.createDataFrame(pairs, "b STRING, h STRING")
    got = [
        r["r"]
        for r in df.select(
            resolve_url_col(F.col("b"), F.col("h")).alias("r")
        ).collect()
    ]
    mism = [(p, g, e) for p, g, e in zip(pairs, got, exp) if g != e]
    assert not mism, f"spark vs py: {len(mism)} mismatches; first: {mism[0]}"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (b VARCHAR, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    duck = [
        row[0]
        for row in con.execute(
            f"SELECT {sql_resolve_url('b', 'h')} FROM t ORDER BY rowid"
        ).fetchall()
    ]
    mism = [(p, g, e) for p, g, e in zip(pairs, duck, exp) if g != e]
    assert not mism, f"duckdb vs py: {len(mism)} mismatches; first: {mism[0]}"


def test_resolve_url_stays_jvm_side(spark):
    """The resolver is pure Catalyst — no Python eval in the plan."""
    from datacube_core_spark.functions.url import resolve_url_col

    df = spark.createDataFrame([("http://a.example/b", "x/../y")], "b STRING, h STRING")
    plan = df.select(
        resolve_url_col(F.col("b"), F.col("h")).alias("r")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_resolved_link_edges_operator(spark):
    """End-to-end: html anchors (relative + absolute + junk) -> edge list;
    non-crawlable hrefs dropped, relative hrefs resolved against the page
    url, verified against the urljoin-backed reference."""
    from datacube_core_spark.functions.url import py_resolve_url
    from datacube_core_spark.operators.graph import resolved_link_edges

    rows = [
        (
            "https://s.example/dir/page1.html",
            b'<a href="../up.html">u</a><a href="img/x.png">i</a>'
            b'<a href="#top">t</a><a href="https://abs.example/p">a</a>',
        ),
        (
            "https://s.example/p2",
            b'<a href="//cdn.example/l.js">c</a><a href="mailto:a@b">m</a>'
            b'<a href="?page=2">q</a>',
        ),
    ]
    df = spark.createDataFrame(rows, "url STRING, html BINARY")
    got = sorted(
        (r["src"], r["dst"]) for r in resolved_link_edges(df).collect()
    )
    exp = []
    import re

    for url, html in rows:
        for href in re.findall(r'href="([^"]*)"', html.decode()):
            d = py_resolve_url(url, href)
            if d is not None:
                exp.append((url, d))
    assert got == sorted(exp)
    assert ("https://s.example/dir/page1.html", "https://s.example/up.html") in got
    assert ("https://s.example/p2", "https://s.example/p2?page=2") in got
