"""URL canonicalization + host/domain extraction (webtext pipeline ops).

Common-Crawl-style corpora dedup and aggregate on CANONICAL urls: the
same page is re-crawled as ``http://WWW.Site.com/page?utm_source=x#frag``
and ``https://site.com/page`` — treating those as distinct urls inflates
url-dedup misses and per-host statistics.  All transforms are single
Catalyst ``regexp_replace``/``regexp_extract`` chains (JVM codegen, no
Python), and each has a DuckDB SQL twin in ``__spark_entry__`` (entry
``url_canon``).

Canonicalization steps (order matters):
1. strip the ``#fragment``
2. drop tracking params (``utm_*``) with separator cleanup
3. strip a dangling ``?``/``&``
4. normalize scheme to https
5. strip a leading ``www.``
6. lowercase the HOST ONLY (paths are case-sensitive)
7. strip one trailing slash
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_tracking_col(url: Column) -> Column:
    """Steps 1-3: fragment, utm_* params, dangling separators.

    Tracking params are removed by PARAM-LIST FILTERING, not substring
    regex (code-review r4: an unanchored ``utm_`` regex also chewed
    ``?q=utm_test&...`` — a param whose VALUE contains the substring; and
    the anchored form can't take consecutive utm params in one pass
    without lookbehind, which DuckDB's RE2 lacks): split the query at the
    first ``?``, drop params whose NAME starts with ``utm_``, rejoin."""
    u = F.regexp_replace(url, r"#.*", "")
    qpos = F.locate("?", u)
    base = F.when(qpos > 0, F.substring(u, F.lit(1), qpos - 1)).otherwise(u)
    query = F.when(qpos > 0, u.substr(qpos + 1, F.length(u))).otherwise(F.lit(""))
    # empty params (dangling ?/& separators) are dropped too
    kept = F.filter(F.split(query, "&"), lambda p: (~p.startswith("utm_")) & (p != ""))
    joined = F.array_join(kept, "&")
    return (
        F.when(qpos == 0, u)
        .when(F.length(joined) > 0, F.concat(base, F.lit("?"), joined))
        .otherwise(base)
    )


def host_col(url: Column) -> Column:
    """Lower-cased host, leading ``www.`` stripped AFTER lowercasing so
    ``WWW.``/``Www.`` variants normalize too (no port handling — the
    synthetic corpus has none)."""
    h = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://([^/?#]+)", 1))
    return F.regexp_replace(h, r"^www\.", "")


def domain_col(url: Column) -> Column:
    """Registrable-domain approximation: the last two dot-labels of the
    host (a public-suffix list is an external dataset; the 2-label rule
    is the standard stand-in and is twinned exactly in the oracle)."""
    return F.regexp_extract(host_col(url), r"([^.]+\.[^.]+)$", 1)


def canonical_url_col(url: Column) -> Column:
    u = strip_tracking_col(url)
    u = F.regexp_replace(u, r"^http://", "https://")
    host = F.lower(F.regexp_extract(u, r"^https://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")  # after lowercasing: WWW. too
    rest = F.regexp_replace(u, r"^https://[^/?#]*", "")
    u = F.concat(F.lit("https://"), host, rest)
    return F.regexp_replace(u, r"/$", "")


# --- DuckDB twins (RE2 syntax; backrefs are \\1, not $1) -------------------

def sql_strip_tracking(col: str = "url") -> str:
    """DuckDB twin of the param-list filter ('g' on the fragment strip:
    DuckDB regexp_replace is first-match-only without it)."""
    u = f"regexp_replace({col}, '#.*', '', 'g')"
    base = f"(CASE WHEN strpos({u}, '?') > 0 THEN substr({u}, 1, strpos({u}, '?') - 1) ELSE {u} END)"
    query = f"(CASE WHEN strpos({u}, '?') > 0 THEN substr({u}, strpos({u}, '?') + 1) ELSE '' END)"
    joined = (
        f"array_to_string(list_filter(string_split({query}, '&'),"
        " p -> NOT starts_with(p, 'utm_') AND p <> ''), '&')"
    )
    return (
        f"(CASE WHEN strpos({u}, '?') = 0 THEN {u}"
        f" WHEN length({joined}) > 0 THEN {base} || '?' || {joined}"
        f" ELSE {base} END)"
    )


def sql_host(col: str = "url") -> str:
    return (
        f"regexp_replace(lower(regexp_extract({col}, '^[a-zA-Z]+://([^/?#]+)', 1)),"
        " '^www\\.', '')"
    )


def sql_domain(col: str = "url") -> str:
    return f"regexp_extract({sql_host(col)}, '([^.]+\\.[^.]+)$', 1)"


def sql_canonical_url(col: str = "url") -> str:
    # anchored patterns below can only match once, so 'g' is not needed
    u = sql_strip_tracking(col)
    u = f"regexp_replace({u}, '^http://', 'https://')"
    host = f"regexp_replace(lower(regexp_extract({u}, '^https://([^/?#]*)', 1)), '^www\\.', '')"
    rest = f"regexp_replace({u}, '^https://[^/?#]*', '')"
    return f"regexp_replace('https://' || {host} || {rest}, '/$', '')"
