"""SURT (Sort-friendly URI Reordering Transform) — the web-archive URL key.

CDX capture indexes (Internet Archive / Common Crawl) are sorted by a
canonicalized, host-reversed form of the URL so that all captures of a
host — and of its subdomains — are lexicographically adjacent:

    https://www.Example.com:443/Path?b=2&a=1
        → com,example)/path?a=1&b=2

The transform implemented here follows the published Heritrix /
webarchive-commons / pywb canonical-SURT semantics:

1. strip the ``#fragment``
2. lowercase the WHOLE url (CDX canonicalization lowercases paths too —
   the index key is a lookup key, not a display url)
3. strip the scheme (``https://`` and any other ``x://``)
4. strip a leading ``www.``
5. strip an explicit default port (``:80`` / ``:443``); other ports are
   kept (a non-default port is a distinct origin)
6. reverse the host's dot-labels and join with commas, append ``)``
7. append the path verbatim
8. sort the query params bytewise, drop empty params, rejoin with ``&``
   (a dangling ``?`` disappears)

Everything is a single Catalyst expression chain (regexp + array ops,
JVM whole-stage codegen, no UDF) with a term-identical DuckDB twin —
both engines split/filter/sort/join the same strings, so the driver's
hash compare checks the transform end-to-end.

Scale shape: a pure per-row map — no shuffle, embarrassingly parallel.
Reference analog: none in ODC (webtext-axis extension, SURVEY §2.2
family); the transform itself is the public Heritrix SURT spec.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _surt_host(url: Column) -> Column:
    """Reversed comma-joined host labels; a NON-default port survives
    AFTER the reversal (``example.com:8080`` → ``com,example:8080``) so
    captures of one origin still sort adjacently under the host."""
    u = F.lower(F.regexp_replace(url, r"#.*", ""))
    u = F.regexp_replace(u, r"^[a-z]+://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    authority = F.regexp_extract(u, r"^([^/?]*)", 1)
    authority = F.regexp_replace(authority, r":(80|443)$", "")
    host = F.regexp_replace(authority, r":\d+$", "")
    port = F.regexp_extract(authority, r"(:\d+)$", 1)
    return F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","), port)


def surt_host_col(url: Column) -> Column:
    """SURT host part of a RAW url (steps 2-6)."""
    return _surt_host(url)


def surt_key_col(url: Column) -> Column:
    """Full SURT key (steps 1-8): ``com,example)/path?a=1&b=2``."""
    u = F.lower(F.regexp_replace(url, r"#.*", ""))
    u = F.regexp_replace(u, r"^[a-z]+://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    rev = _surt_host(url)
    rest = F.regexp_replace(u, r"^[^/?]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    qpos = F.locate("?", rest)
    query = F.when(qpos > 0, rest.substr(qpos + 1, F.length(rest))).otherwise(F.lit(""))
    kept = F.filter(F.split(query, "&"), lambda p: p != "")
    sorted_q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        rev, F.lit(")"), path,
        F.when(F.length(sorted_q) > 0, F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


# --- DuckDB twins (RE2 syntax; anchored patterns need no 'g') ---------------

def _sql_prefix(col: str) -> tuple[str, str]:
    """Shared canonical prefix: (lowercased scheme/www-stripped url,
    reversed host with a surviving non-default port appended)."""
    u = f"regexp_replace(lower(regexp_replace({col}, '#.*', '', 'g')), '^[a-z]+://', '')"
    u = f"regexp_replace({u}, '^www\\.', '')"
    auth = f"regexp_replace(regexp_extract({u}, '^([^/?]*)', 1), ':(80|443)$', '')"
    host = f"regexp_replace({auth}, ':[0-9]+$', '')"
    port = f"regexp_extract({auth}, '(:[0-9]+)$', 1)"
    rev = (
        f"(array_to_string(list_reverse(string_split({host}, '.')), ',')"
        f" || {port})"
    )
    return u, rev


def sql_surt_host(col: str = "url") -> str:
    _, rev = _sql_prefix(col)
    return rev


def sql_surt_key(col: str = "url") -> str:
    u, rev = _sql_prefix(col)
    rest = f"regexp_replace({u}, '^[^/?]*', '')"
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    query = (
        f"(CASE WHEN strpos({rest}, '?') > 0"
        f" THEN substr({rest}, strpos({rest}, '?') + 1) ELSE '' END)"
    )
    sorted_q = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'),"
        " p -> p <> '')), '&')"
    )
    return (
        f"({rev} || ')' || {path} ||"
        f" (CASE WHEN length({sorted_q}) > 0 THEN '?' || {sorted_q} ELSE '' END))"
    )
