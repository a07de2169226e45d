"""SURT urlkey: spec vectors, Spark↔DuckDB parity, python-reference fuzz."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.functions.surt import (
    sql_surt_host,
    sql_surt_key,
    surt_host_col,
    surt_key_col,
)

# (url, expected SURT key) — written from the published Heritrix/pywb
# canonical-SURT semantics (lowercase, scheme/www/default-port strip,
# host label reversal, sorted query)
VECTORS = [
    ("https://www.Example.com/Path?b=2&a=1", "com,example)/path?a=1&b=2"),
    ("http://example.com:80/", "com,example)/"),
    ("https://EXAMPLE.com:443/x", "com,example)/x"),
    ("https://example.com:8080/x", "com,example:8080)/x"),  # non-default port kept
    ("https://sub.www2.example.co.uk/a/b", "uk,co,example,www2,sub)/a/b"),
    ("https://example.com", "com,example)"),
    ("https://example.com/?", "com,example)/"),
    ("https://example.com/p?z=1&y=&x=2#frag", "com,example)/p?x=2&y=&z=1"),
    ("https://www.example.com/p?a=1&a=0", "com,example)/p?a=0&a=1"),
    ("HTTPS://WWW.EXAMPLE.COM/UPPER", "com,example)/upper"),
]


def _py_surt(url: str) -> str:
    """Independent python reference (not the Catalyst chain)."""
    import re

    u = re.sub(r"#.*", "", url).lower()
    u = re.sub(r"^[a-z]+://", "", u)
    u = re.sub(r"^www\.", "", u)
    m = re.match(r"^([^/?]*)", u)
    auth = re.sub(r":(80|443)$", "", m.group(1))
    pm = re.search(r"(:\d+)$", auth)
    host, port = (auth[: pm.start()], pm.group(1)) if pm else (auth, "")
    rest = u[m.end():]
    path = rest.split("?", 1)[0]
    query = rest.split("?", 1)[1] if "?" in rest else ""
    params = sorted(p for p in query.split("&") if p != "")
    rev = ",".join(reversed(host.split("."))) + port
    return rev + ")" + path + ("?" + "&".join(params) if params else "")


def test_vectors_python_reference():
    for url, want in VECTORS:
        assert _py_surt(url) == want, url


def test_vectors_spark(spark):
    df = spark.createDataFrame([Row(url=u) for u, _ in VECTORS])
    got = [r.k for r in df.select(surt_key_col(F.col("url")).alias("k")).collect()]
    assert got == [w for _, w in VECTORS]


def test_vectors_duckdb():
    con = duckdb.connect()
    for url, want in VECTORS:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS url", [url])
        (got,) = con.execute(f"SELECT {sql_surt_key('url')} FROM t").fetchone()
        assert got == want, url


def test_host_col_parity(spark):
    urls = [u for u, _ in VECTORS]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    sk = [r.h for r in df.select(surt_host_col(F.col("url")).alias("h")).collect()]
    con = duckdb.connect()
    dk = []
    for u in urls:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS url", [u])
        dk.append(con.execute(f"SELECT {sql_surt_host('url')} FROM t").fetchone()[0])
    assert sk == dk


def test_fuzz_three_engines(spark):
    """Seeded generative urls: Spark, DuckDB, and the python reference
    must agree on every one."""
    import random

    rng = random.Random(20260818)
    schemes = ["http://", "https://", "HTTP://", "ftp://"]
    hosts = ["example.com", "WWW.Example.com", "a.b.c.d.example.org",
             "www.site9.example:443", "h.example:8080", "x.example:80"]
    paths = ["", "/", "/A/B", "/p%20q", "/index.html"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?z=&b=1&b=0", "?UTM=3&q=x&&"]
    frags = ["", "#f", "#a?b=1"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
        + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls])
    sk = [r.k for r in df.select(surt_key_col(F.col("url")).alias("k")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(urls)))
    dk = [r[0] for r in con.execute(
        f"SELECT {sql_surt_key('url')} FROM t ORDER BY i").fetchall()]
    pk = [_py_surt(u) for u in urls]
    for u, a, b, c in zip(urls, sk, dk, pk):
        assert a == b == c, u


def test_surt_plan_is_pure_catalyst(spark):
    df = spark.createDataFrame([Row(url=u) for u, _ in VECTORS])
    plan = (
        df.select(surt_key_col(F.col("url")).alias("k"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
