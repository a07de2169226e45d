"""robots.txt REP matching: spec vectors, python-reference fuzz, plan."""

import random

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datacube_core_spark.functions.robots import (
    robots_allowed,
    robots_allowed_py,
    rule_regex,
    sql_robots_allowed,
)

# Google REP documentation examples (allow/disallow match table)
SPEC_CASES = [
    # (rules, path, expected_allowed)
    ([(False, "/")], "/anything", False),
    ([(False, "/")], "/", False),
    ([(False, "/fish")], "/fish.html", False),          # prefix
    ([(False, "/fish")], "/fishheads/yummy.html", False),
    ([(False, "/fish")], "/Fish.asp", True),            # case-sensitive
    ([(False, "/fish*")], "/fish/salmon.html", False),  # trailing * = prefix
    ([(False, "/fish/")], "/fish", True),               # dir slash matters
    ([(False, "/*.php")], "/folder/filename.php", False),
    ([(False, "/*.php")], "/windows.PHP", True),
    ([(False, "/*.php$")], "/filename.php", False),
    ([(False, "/*.php$")], "/filename.php?parameters", True),  # $ anchor
    ([(False, "/fish*.php")], "/fish.php", False),
    ([(False, "/fish*.php")], "/fishheads/catfish.php?parameters", False),
    # longest match wins; allow wins exact ties
    ([(True, "/p"), (False, "/")], "/page", True),
    ([(True, "/folder/"), (False, "/folder")], "/folder/page", True),
    ([(True, "/page"), (False, "/*.htm")], "/page.htm", False),
    ([(True, "/$"), (False, "/")], "/", True),
    ([(True, "/$"), (False, "/")], "/page.htm", False),
    ([], "/whatever", True),
]


@pytest.mark.parametrize("rules,path,want", SPEC_CASES)
def test_python_reference_matches_spec(rules, path, want):
    assert robots_allowed_py(path, rules) is want


def test_catalyst_and_duckdb_match_reference_fuzz(spark):
    rng = random.Random(20260817)
    pieces = ["fish", "page", "*", ".php", "p", "folder", "7", "1",
              "salmon", ".htm", "?x=1", "a"]
    path_pieces = pieces + ["\n"]  # newline paths pin the \z anchor parity
    rulesets = []
    for _ in range(12):
        n = rng.randint(0, 4)
        rules = []
        for _ in range(n):
            pat = "/" + "".join(rng.choice(pieces) for _ in range(rng.randint(1, 3)))
            if rng.random() < 0.3:
                pat += "$"
            rules.append((rng.random() < 0.5, pat))
        rulesets.append(rules)
    paths = []
    for _ in range(120):
        paths.append("/" + "/".join(
            "".join(rng.choice(path_pieces) for _ in range(rng.randint(1, 2)))
            for _ in range(rng.randint(0, 3))
        ))
    df = spark.createDataFrame([Row(i=i, p=p) for i, p in enumerate(paths)])
    con = duckdb.connect()
    for rules in rulesets:
        got = {
            r.i: r.a
            for r in df.select("i", robots_allowed(F.col("p"), rules).alias("a")).collect()
        }
        want = {i: robots_allowed_py(p, rules) for i, p in enumerate(paths)}
        assert got == want, rules
        # DuckDB twin on the same paths
        sql = sql_robots_allowed("p", rules)
        for i, p in enumerate(paths):
            (duck,) = con.execute(
                f"SELECT {sql} FROM (SELECT ? AS p)", [p]
            ).fetchone()
            assert bool(duck) is want[i], (rules, p)


def test_rule_regex_shape():
    # \z (absolute end), NOT $: Java matches $ before a trailing newline,
    # RE2 does not — \z is end-of-text in both; python dialect spells \Z
    assert rule_regex("/fish*.php$") == "^/fish.*\\.php\\z"
    assert rule_regex("/fish*.php$", dialect="python") == "^/fish.*\\.php\\Z"
    assert rule_regex("/a?b") == "^/a\\?b"
    with pytest.raises(ValueError):
        rule_regex("/x", dialect="pcre")


def test_end_anchor_trailing_newline_three_engines(spark):
    # the dialect-divergence shape: a path with a trailing newline must
    # NOT match an end-anchored rule in ANY engine
    rules = [(False, "/fish$")]
    for path, want in [("/fish", False), ("/fish\n", True), ("/fishx", True)]:
        assert robots_allowed_py(path, rules) is want, path
    df = spark.createDataFrame([Row(i=0, p="/fish"), Row(i=1, p="/fish\n")])
    got = {r.i: r.a for r in df.select(
        "i", robots_allowed(F.col("p"), rules).alias("a")).collect()}
    assert got == {0: False, 1: True}
    con = duckdb.connect()
    sql = sql_robots_allowed("p", rules)
    assert con.execute(f"SELECT {sql} FROM (SELECT '/fish' || chr(10) AS p)").fetchone()[0]


def test_entry_plan_pure_jvm(spark):
    import __spark_entry__ as entry_mod

    from .conftest import SF_TINY

    df = entry_mod.queries()["robots_filter"](spark, SF_TINY)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_parse_robots_df_group_selection(spark):
    from datacube_core_spark.functions.robots import parse_robots_df

    files = spark.createDataFrame(
        [
            # exact group preferred over star; case-insensitive agent
            Row(host=0, txt="user-agent: MyBot\nDisallow: /a/\n\nUser-agent: *\nDisallow: /\n"),
            # only unrelated group -> no rules
            Row(host=1, txt="User-agent: other\nDisallow: /\n"),
            # star group with comments, blank and junk lines
            Row(host=2, txt="# hi\nUser-agent: *\nnoise line\nAllow: /ok/ # trail\nDisallow: /no/\n"),
            # multi-agent group header (two UA lines open ONE group) —
            # both orders must give mybot the group's rules (RFC 9309)
            Row(host=3, txt="User-agent: other\nUser-agent: mybot\nDisallow: /x/\n"),
            Row(host=4, txt="User-agent: mybot\nUser-agent: other\nDisallow: /y/\n"),
        ]
    )
    rules = {
        (r.host, r.is_allow, r.pattern): r.rx
        for r in parse_robots_df(files, "mybot").collect()
    }
    assert set(rules) == {
        (0, False, "/a/"),
        (2, True, "/ok/"),
        (2, False, "/no/"),
        (3, False, "/x/"),
        (4, False, "/y/"),
    }
    assert rules[(0, False, "/a/")] == "^/a/"


def test_parse_robots_df_rejects_regex_specials(spark):
    from datacube_core_spark.functions.robots import parse_robots_df

    files = spark.createDataFrame(
        [Row(host=0, txt="User-agent: *\nDisallow: /a(b)/\n")]
    )
    import py4j.protocol

    with pytest.raises(Exception, match="unsupported robots.txt pattern"):
        parse_robots_df(files, "mybot").collect()


def test_robots_txt_entry_equals_compiled_rules(spark):
    """The parsed-raw-file path and the compile-time-rule path must make
    identical decisions — the file texts encode the same rule sets."""
    import __spark_entry__ as entry_mod

    from .conftest import SF_TINY

    rt = {
        r.doc_id: (r.allowed, r.best_score)
        for r in entry_mod.queries()["robots_txt"](spark, SF_TINY).collect()
    }
    rf = {
        r.doc_id: (r.allowed, r.best_score)
        for r in entry_mod.queries()["robots_filter"](spark, SF_TINY).collect()
    }
    assert rt == rf


def test_parse_crawl_delay_group_selection(spark):
    from datacube_core_spark.functions.robots import parse_crawl_delay_df

    files = spark.createDataFrame(
        [
            # badbot's delay must not apply; star group's 5 does
            Row(host=0, txt="User-agent: badbot\nCrawl-delay: 99\n\nUser-agent: *\nCrawl-delay: 5\n"),
            # exact group's delay beats star's
            Row(host=1, txt="User-agent: mybot\ncrawl-delay: 3\n\nUser-agent: *\nCrawl-delay: 9\n"),
            # non-numeric ignored; MAX of several in applicable groups
            Row(host=2, txt="User-agent: *\nCrawl-delay: abc\nCrawl-delay: 2\nCrawl-delay: 4\n"),
            # no directive -> absent from output (caller defaults)
            Row(host=3, txt="User-agent: *\nDisallow: /x/\n"),
        ]
    )
    got = {r.host: r.delay_s for r in parse_crawl_delay_df(files, "mybot").collect()}
    assert got == {0: 5, 1: 3, 2: 4}


def test_crawl_schedule_invariants(spark):
    from datacube_core_spark.functions.robots import crawl_schedule_df

    pages_rows = [Row(doc_id=i, host=i % 3, ts=1000 - i) for i in range(30)]
    pdf = spark.createDataFrame(pages_rows)
    delays = spark.createDataFrame([Row(host=0, delay_s=7)])
    out = crawl_schedule_df(pdf, delays, default_s=2).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
        assert r.fetch_offset_s == r.rank * r.delay_s
        assert r.delay_s == (7 if r.host == 0 else 2)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(len(rows)))
        # rank order == (ts, doc_id) order: ts here is strictly decreasing
        # in doc_id, so rank must be decreasing-doc_id order
        ids = [r.doc_id for r in rows]
        assert ids == sorted(ids, reverse=True)
