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
    """Steps 1-3: fragment, utm_* params, dangling separators."""
    u = F.regexp_replace(url, r"#.*", "")
    u = F.regexp_replace(u, r"utm_[^&#]*&", "")     # param followed by more
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*$", "")  # trailing param
    return F.regexp_replace(u, r"[?&]$", "")


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
    # 'g' = replace ALL matches: DuckDB regexp_replace is first-match-only
    # by default, while Spark's replaces every match — a 2+-utm-param url
    # would diverge without it (same reason pii.sql_scrub_pii carries 'g')
    return (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"{col}, '#.*', '', 'g'), 'utm_[^&#]*&', '', 'g'), '[?&]utm_[^&#]*$', '', 'g'), '[?&]$', '', 'g')"
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
