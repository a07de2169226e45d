"""HTML → text extraction (webtext pipeline main-content extractor).

The north rule's per-row invariant is *byte-identical extracted text per
url*: pages arrive as an ``html:binary`` column (Common-Crawl style) and
the engine must recover the page text exactly — a wrong extractor
silently corrupts every downstream text operator (dedup, lang-id,
quality, tokenization).  Reference analog: datacube normalizes every
raw document into canonical measurement columns before anything else
touches it (``datacube/index/eo3.py:77-157`` does this for spatial
fields); here the canonical column is the extracted text.

The extractor is the standard main-content pipeline used by web-corpus
builders (strip ``<script>``/``<style>`` blocks with their content,
strip comments, take paragraph ``<p>`` contents as the main content,
drop boilerplate — titles / headings / nav links — strip inline tags,
decode HTML entities).  Everything is a single Catalyst
``regexp_replace`` / ``regexp_extract_all`` chain: JVM whole-stage
codegen, no Python in the hot path, and RE2-compatible patterns so the
DuckDB oracle twin (``sql_extract_text``) runs the byte-same transform.

Entity handling is order-critical in BOTH directions:
- escape: ``&`` must be escaped FIRST (else already-escaped entities
  get double-escaped);
- unescape: ``&amp;`` must be decoded LAST (else ``&amp;lt;`` — a page
  literally showing the text "&lt;" — would wrongly become ``<``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: escape order matters: '&' first.  (name, entity) pairs.
ENTITIES = (
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#39;"),
)

# RE2- and java.util.regex-compatible patterns (no lookbehind).
_SCRIPT_RE = r"(?s)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?s)<style\b[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_PARA_RE = r"(?s)<p\b[^>]*>(.*?)</p>"
_INLINE_TAG_RE = r"<[^>]+>"
_PARA_SEP = "\n\n"


def escape_html_col(text: Column) -> Column:
    """Entity-escape page text for embedding in an HTML body."""
    out = text
    for ch, ent in ENTITIES:
        out = F.replace(out, F.lit(ch), F.lit(ent))
    return out


def unescape_html_col(s: Column) -> Column:
    """Decode the five core entities; ``&amp;`` last (see module doc)."""
    out = s
    for ch, ent in reversed(ENTITIES):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def extract_text_col(html_bin: Column) -> Column:
    """Main-content text from an ``html:binary`` column, pure Catalyst.

    Pipeline: UTF-8 decode → drop script/style blocks (content included)
    → drop comments → collect ``<p>`` paragraph bodies (joined by a
    blank line) → strip inline tags → decode entities.  Boilerplate
    outside paragraphs (title, headings, nav anchors) is dropped — this
    is the main-content contract, and what makes the round-trip against
    the generator byte-exact.
    """
    h = F.decode(html_bin, "UTF-8")
    h = F.regexp_replace(h, _SCRIPT_RE, "")
    h = F.regexp_replace(h, _STYLE_RE, "")
    h = F.regexp_replace(h, _COMMENT_RE, "")
    paras = F.regexp_extract_all(h, F.lit(_PARA_RE), F.lit(1))
    body = F.array_join(paras, _PARA_SEP)
    body = F.regexp_replace(body, _INLINE_TAG_RE, "")
    return unescape_html_col(body)


# ---------------------------------------------------------------------------
# DuckDB SQL twins (same patterns; RE2 engine). Single-quoted SQL string
# literals keep backslashes literal, so patterns embed verbatim except for
# quote doubling.
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_escape_html(col: str) -> str:
    out = col
    for ch, ent in ENTITIES:
        out = f"replace({out}, {_sql_quote(ch)}, {_sql_quote(ent)})"
    return out


def sql_unescape_html(col: str) -> str:
    out = col
    for ch, ent in reversed(ENTITIES):
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return out


def sql_extract_text(col: str) -> str:
    """DuckDB expression mirroring :func:`extract_text_col` (input is a
    VARCHAR html column — the oracle derives html as text)."""
    h = f"regexp_replace({col}, {_sql_quote(_SCRIPT_RE)}, '', 'g')"
    h = f"regexp_replace({h}, {_sql_quote(_STYLE_RE)}, '', 'g')"
    h = f"regexp_replace({h}, {_sql_quote(_COMMENT_RE)}, '', 'g')"
    body = (
        f"array_to_string(regexp_extract_all({h}, {_sql_quote(_PARA_RE)}, 1),"
        f" chr(10) || chr(10))"
    )
    body = f"regexp_replace({body}, {_sql_quote(_INLINE_TAG_RE)}, '', 'g')"
    return sql_unescape_html(body)


# ---------------------------------------------------------------------------
# link extraction (web-graph edges come from the ACTUAL html anchors)
# ---------------------------------------------------------------------------

_OUTLINK_RE = r'href="https://site[0-9]+\.example/out/([0-9]+)"'


def extract_outlinks_col(html_bin: Column) -> Column:
    """Array of outlink target uids (long) parsed from the page's
    ``<a href=".../out/<uid>">`` anchors — the edge list of the web
    graph is extracted from the html payload itself, not re-derived
    arithmetically (the oracle twin re-derives it, which is exactly
    what makes the extraction verifiable)."""
    h = F.decode(html_bin, "UTF-8")
    return F.transform(
        F.regexp_extract_all(h, F.lit(_OUTLINK_RE), F.lit(1)),
        lambda s: s.cast("long"),
    )


def sql_extract_outlinks(col: str) -> str:
    return (
        f"list_transform(regexp_extract_all({col}, {_sql_quote(_OUTLINK_RE)}, 1),"
        f" s -> CAST(s AS BIGINT))"
    )


#: every anchor href VALUE, absolute or relative (the general-crawl form;
#: the uid-anchor extractor above is the synthetic-graph fast path)
_HREF_RE = r'href="([^"]*)"'


def extract_hrefs_col(html_bin: Column) -> Column:
    """Array of raw href attribute values — feed each through
    ``functions/url.resolve_url_col`` against the page's own URL to get
    the real link-graph edge list (relative hrefs dominate real HTML)."""
    return F.regexp_extract_all(
        F.decode(html_bin, "UTF-8"), F.lit(_HREF_RE), 1
    )


def sql_extract_hrefs(col: str) -> str:
    return f"regexp_extract_all({col}, {_sql_quote(_HREF_RE)}, 1)"


#: full anchor elements: group 1 = href value, group 2 = inner content.
#: Non-greedy inner match + (?s) so anchors spanning lines still parse.
_ANCHOR_RE = r'(?s)<a\b[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def anchor_hrefs_col(html_bin: Column) -> Column:
    """Array of anchor href values (position-aligned with
    :func:`anchor_texts_col` — both run the same pattern, so index i of
    each array describes the same ``<a>`` element)."""
    return F.regexp_extract_all(
        F.decode(html_bin, "UTF-8"), F.lit(_ANCHOR_RE), 1
    )


def anchor_texts_col(html_bin: Column) -> Column:
    """Array of anchor INNER TEXTS (inline tags stripped, entities
    decoded, trimmed) — the classic web-search relevance signal: the
    text other pages use to link to a target."""
    raw = F.regexp_extract_all(
        F.decode(html_bin, "UTF-8"), F.lit(_ANCHOR_RE), 2
    )
    return F.transform(
        raw,
        lambda t: F.trim(
            unescape_html_col(F.regexp_replace(t, _INLINE_TAG_RE, ""))
        ),
    )


def sql_anchor_hrefs(col: str) -> str:
    return f"regexp_extract_all({col}, {_sql_quote(_ANCHOR_RE)}, 1)"


def sql_anchor_texts(col: str) -> str:
    inner = f"regexp_replace(t, {_sql_quote(_INLINE_TAG_RE)}, '', 'g')"
    return (
        f"list_transform(regexp_extract_all({col}, {_sql_quote(_ANCHOR_RE)}, 2),"
        f" t -> trim({sql_unescape_html(inner)}))"
    )


# ---------------------------------------------------------------------------
# Pure-Python reference (tests only — the independent third implementation
# the byte-identity test compares both engines against).
# ---------------------------------------------------------------------------

def py_extract_text(html_bytes: bytes) -> str:
    import re

    h = html_bytes.decode("utf-8")
    h = re.sub(_SCRIPT_RE, "", h)
    h = re.sub(_STYLE_RE, "", h)
    h = re.sub(_COMMENT_RE, "", h)
    paras = [m.group(1) for m in re.finditer(_PARA_RE, h)]
    body = _PARA_SEP.join(paras)
    body = re.sub(_INLINE_TAG_RE, "", body)
    for ch, ent in reversed(ENTITIES):
        body = body.replace(ent, ch)
    return body
