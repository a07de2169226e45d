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


# ---------------------------------------------------------------------------
# RFC 3986 relative-reference resolution (href → absolute URL).
#
# The link-graph edge list of a real crawl comes from anchor hrefs, and
# most hrefs are NOT absolute: root-relative (``/a/b``), relative
# (``../img``), protocol-relative (``//cdn.example/x``), query-only
# (``?page=2``).  Resolution against the page's own URL is the step that
# turns raw anchors into graph edges (reference analog: datacube resolves
# every relative lineage/document reference against the document's own
# location before indexing, ``datacube/index/hl.py`` Doc2Dataset URI
# handling).  Crawler contract (the subset of RFC 3986 §5 every corpus
# builder uses):
#
#   * fragments are stripped (``#...`` never reaches the frontier), and
#     so is a trailing EMPTY query (a lone ``?`` — urlunsplit drops it);
#   * empty / fragment-only / empty-query-only hrefs are self-links → NULL;
#   * non-http(s) schemes (javascript:, mailto:, data:, ...) → NULL;
#   * absolute http(s) hrefs pass through VERBATIM (no dot-segment
#     removal — matches urllib.parse.urljoin, which applies RFC 5.2.4
#     only to relative references);
#   * protocol-relative hrefs take the base scheme;
#   * query-only hrefs keep the base path, replace the base query;
#   * root-relative / relative hrefs merge per RFC 5.3 and get
#     remove_dot_segments (RFC 5.2.4) applied to the PATH part only.
#
# remove_dot_segments is a bounded UNROLLED regexp cascade (no loops in
# either engine): each pass collapses ``/./`` runs, one nesting level of
# ``seg/../``, and root-level ``/../`` residue.  ``passes`` bounds the
# resolvable ``..``-nesting depth (default 6; real-world hrefs rarely
# exceed 3 — a deeper href keeps its residue, identically in BOTH
# engines, so the twin contract still holds bit-for-bit).  All patterns
# are RE2-safe (no lookaround): "a segment that is not '.' and not '..'"
# is spelled as the three-way alternation below instead of a lookahead.
# Validated three ways: hand cases, the DuckDB twin, and a seeded fuzz
# against urllib.parse.urljoin (tests/test_url.py).
# ---------------------------------------------------------------------------

#: href has SOME scheme (RFC 3986 scheme = ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ))
_ANY_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"
#: href is an absolute http(s) URL (scheme is case-insensitive per RFC 3.1)
_HTTP_ABS_RE = r"(?i)^https?://"
#: base URL part extractors (base must be an absolute http(s) URL)
_BASE_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_BASE_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_BASE_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
#: one path segment that is neither "." nor ".." (RE2 has no lookahead:
#: [not starting with dot] | [".x..."] | ["..x..."])
_NONDOT_SEG = r"(?:[^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)"
_UPSEG_RE = f"/{_NONDOT_SEG}/\\.\\./"
# end anchors are \z, not $: Java's $ also matches before a trailing
# newline, RE2's does not — \z means end-of-text in BOTH engines.
_UPSEG_END_RE = f"/{_NONDOT_SEG}/\\.\\.\\z"

#: default unrolled remove_dot_segments passes (= max ".." nesting depth)
DOT_SEGMENT_PASSES = 6


def remove_dot_segments_col(path: Column, passes: int = DOT_SEGMENT_PASSES) -> Column:
    """RFC 3986 §5.2.4 on an absolute path (must start with ``/``)."""
    p = path
    for _ in range(passes):
        p = F.regexp_replace(p, r"/\./", "/")
        p = F.regexp_replace(p, r"/\.\z", "/")
        p = F.regexp_replace(p, _UPSEG_RE, "/")
        p = F.regexp_replace(p, _UPSEG_END_RE, "/")
        p = F.regexp_replace(p, r"^(?:/\.\.)+/", "/")
        p = F.regexp_replace(p, r"^(?:/\.\.)+\z", "/")
    return p


def resolve_url_col(
    base: Column, href: Column, passes: int = DOT_SEGMENT_PASSES
) -> Column:
    """Resolve an anchor ``href`` against the page's absolute URL.

    Pure Catalyst (regexp/CASE chains, JVM codegen); NULL for
    non-crawlable hrefs per the module-doc contract."""
    h = F.regexp_replace(href, r"#.*", "")
    # a trailing EMPTY query ("g?") is dropped, like urlunsplit does —
    # the group only matches when the FIRST '?' is the last char
    h = F.regexp_replace(h, r"^([^?]*)\?\z", "$1")
    scheme = F.regexp_extract(base, _BASE_SCHEME_RE, 1)
    auth = F.regexp_extract(base, _BASE_AUTH_RE, 1)
    bpath = F.regexp_extract(base, _BASE_PATH_RE, 1)  # "" when absent
    origin = F.concat(scheme, F.lit("://"), auth)

    # split href into path + ?query (dot-segment removal is PATH-only)
    qpos = F.locate("?", h)
    hpath = F.when(qpos > 0, F.substring(h, F.lit(1), qpos - 1)).otherwise(h)
    qsuffix = F.when(qpos > 0, h.substr(qpos, F.length(h))).otherwise(F.lit(""))

    # RFC 5.3 merge: empty base path + authority → "/" + href path
    bdir = F.when(bpath == "", F.lit("/")).otherwise(
        F.regexp_replace(bpath, r"[^/]*\z", "")
    )
    merged = F.when(hpath.startswith("/"), hpath).otherwise(F.concat(bdir, hpath))
    norm = remove_dot_segments_col(merged, passes)

    return (
        F.when(h == "", F.lit(None).cast("string"))
        .when(h.rlike(_HTTP_ABS_RE), h)
        .when(h.rlike(_ANY_SCHEME_RE), F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("?"), F.concat(origin, bpath, h))
        .otherwise(F.concat(origin, norm, qsuffix))
    )


def sql_remove_dot_segments(p: str, passes: int = DOT_SEGMENT_PASSES) -> str:
    """DuckDB twin of :func:`remove_dot_segments_col` (RE2; 'g' where the
    Spark global-replace semantics need it — anchored patterns match at
    most once either way)."""
    for _ in range(passes):
        p = f"regexp_replace({p}, '/\\./', '/', 'g')"
        p = f"regexp_replace({p}, '/\\.\\z', '/')"
        p = f"regexp_replace({p}, '{_UPSEG_RE}', '/', 'g')"
        p = f"regexp_replace({p}, '{_UPSEG_END_RE}', '/')"
        p = f"regexp_replace({p}, '^(?:/\\.\\.)+/', '/')"
        p = f"regexp_replace({p}, '^(?:/\\.\\.)+\\z', '/')"
    return p


def sql_resolve_url(
    base: str, href: str, passes: int = DOT_SEGMENT_PASSES
) -> str:
    """DuckDB twin of :func:`resolve_url_col` (same patterns, same branch
    order; ``base``/``href`` are SQL expressions)."""
    h = f"regexp_replace({href}, '#.*', '', 'g')"
    h = f"regexp_replace({h}, '^([^?]*)\\?\\z', '\\1')"  # RE2 backref is \1
    scheme = f"regexp_extract({base}, '{_BASE_SCHEME_RE}', 1)"
    auth = f"regexp_extract({base}, '{_BASE_AUTH_RE}', 1)"
    bpath = f"regexp_extract({base}, '{_BASE_PATH_RE}', 1)"
    origin = f"({scheme} || '://' || {auth})"

    hpath = f"(CASE WHEN strpos({h}, '?') > 0 THEN substr({h}, 1, strpos({h}, '?') - 1) ELSE {h} END)"
    qsuffix = f"(CASE WHEN strpos({h}, '?') > 0 THEN substr({h}, strpos({h}, '?')) ELSE '' END)"

    bdir = (
        f"(CASE WHEN {bpath} = '' THEN '/'"
        f" ELSE regexp_replace({bpath}, '[^/]*\\z', '', 'g') END)"
    )
    merged = f"(CASE WHEN starts_with({hpath}, '/') THEN {hpath} ELSE {bdir} || {hpath} END)"
    norm = sql_remove_dot_segments(merged, passes)

    return (
        f"(CASE WHEN {h} = '' THEN CAST(NULL AS VARCHAR)"
        f" WHEN regexp_matches({h}, '{_HTTP_ABS_RE}') THEN {h}"
        f" WHEN regexp_matches({h}, '{_ANY_SCHEME_RE}') THEN CAST(NULL AS VARCHAR)"
        f" WHEN starts_with({h}, '//') THEN {scheme} || ':' || {h}"
        f" WHEN starts_with({h}, '?') THEN {origin} || {bpath} || {h}"
        f" ELSE {origin} || {norm} || {qsuffix} END)"
    )


def py_resolve_url(base: str, href: str) -> str | None:
    """Independent third implementation of the crawler contract — the
    NULL-mapping branches are spelled out here, the RFC-equivalence
    branches delegate to ``urllib.parse.urljoin`` (the stdlib RFC 3986
    resolver), so the fuzz test pits the Catalyst/DuckDB twins against
    an implementation they share no code with."""
    import re
    from urllib.parse import urljoin

    h = href.split("#", 1)[0]
    if h.endswith("?") and h.find("?") == len(h) - 1:
        h = h[:-1]
    if h == "":
        return None
    if re.match(r"(?i)^https?://", h):
        return h
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", h):
        return None
    return urljoin(base, h)
