"""sitemap.xml (sitemaps.org protocol) build / parse.

The third member of the crawl-source family (WARC archives, robots.txt
policy, sitemap discovery): a per-host XML document listing `<url>`
entries with `<loc>` and `<lastmod>`.  Both directions are pure
Catalyst:

* build — each page renders its `<url>` entry, then ONE ordered string
  aggregation per host (collect_list of (sort-key, entry) structs →
  array_sort → array_join) assembles the document; the deterministic
  in-document order is part of the contract (the oracle replays it as
  ROW_NUMBER).
* parse — regexp_extract_all over `<loc>`/`<lastmod>` pairs, zipped and
  posexploded back to one row per entry with its in-document position.

Scale shape: one shuffle to group by host (the real layout — one
sitemap per host), then shuffle-free maps.  Entry values go through
full five-entity XML escaping (`xml_escape_col` — `&` first on escape,
last on unescape, so the chain is bijective on any input); the parse
side unescapes, making build→parse an identity for arbitrary locs.

Index tier (`build_sitemap_chunks` / `build_sitemap_index` /
`parse_sitemap_index`): the protocol caps a sitemap at 50 000 URLs, so
a big host splits into numbered chunk sitemaps plus one
`<sitemapindex>` document listing them — chunking is a per-host
ROW_NUMBER window (the same shuffle the plain build pays), the index is
a second tiny per-host aggregation.

Reference analog: none in ODC; webtext-axis source family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LASTMOD_FMT_SPARK = "yyyy-MM-dd"
LASTMOD_FMT_DUCK = "%Y-%m-%d"
_NEEDS_ESCAPE = "[&<>]"

# The five XML entities, in ESCAPE order: '&' must go first (or the
# replacement ampersands get re-escaped); unescape applies the reverse
# order with '&amp;' last (or '&amp;lt;' would decode twice).  Literal
# whole-string replaces (not regex) — Spark `replace` and DuckDB
# `replace` share exact all-occurrence literal semantics, so the twin
# chains are term-identical.
XML_ENTITIES = (
    ("&", "&amp;"),
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&apos;"),
)


def xml_escape_col(c: Column) -> Column:
    for raw, ent in XML_ENTITIES:
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def xml_unescape_col(c: Column) -> Column:
    """Inverse of ``xml_escape_col`` (the five predefined entities only —
    not a general character-reference decoder)."""
    for raw, ent in reversed(XML_ENTITIES):
        c = F.replace(c, F.lit(ent), F.lit(raw))
    return c


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_xml_escape(col: str) -> str:
    for raw, ent in XML_ENTITIES:
        col = f"replace({col}, {_sql_quote(raw)}, {_sql_quote(ent)})"
    return col


def sql_xml_unescape(col: str) -> str:
    for raw, ent in reversed(XML_ENTITIES):
        col = f"replace({col}, {_sql_quote(ent)}, {_sql_quote(raw)})"
    return col


def sitemap_entry_col(loc: Column, lastmod_ts: Column, escape: bool = True) -> Column:
    """One `<url>` entry.  ``escape=True`` (default) runs the loc through
    the five-entity escape; ``escape=False`` keeps the legacy guard that
    raises on a loc needing escaping (callers that contractually forbid
    specials get a loud failure instead of silent mutation)."""
    if escape:
        safe = xml_escape_col(loc)
    else:
        safe = F.when(~loc.rlike(_NEEDS_ESCAPE), loc).otherwise(
            F.raise_error(F.concat(F.lit("loc needs XML escaping: "), loc))
        )
    return F.concat(
        F.lit("<url><loc>"), safe,
        F.lit("</loc><lastmod>"), F.date_format(lastmod_ts, LASTMOD_FMT_SPARK),
        F.lit("</lastmod></url>"),
    )


def build_sitemaps(pages_df: DataFrame, host_col: str = "host",
                   order_col: str = "doc_id", loc_col: str = "url",
                   ts_col: str = "warc_ts", escape: bool = True) -> DataFrame:
    """(host, …) → (host, xml): one sitemap per host, entries in
    ``order_col`` order via sort-keyed collect_list (no per-host python,
    no global sort)."""
    e = pages_df.select(
        host_col,
        F.struct(
            F.col(order_col).alias("k"),
            sitemap_entry_col(F.col(loc_col), F.col(ts_col), escape=escape).alias("s"),
        ).alias("kv"),
    )
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list("kv")), lambda x: x["s"]), ""
    )
    return e.groupBy(host_col).agg(
        F.concat(F.lit("<urlset>"), body, F.lit("</urlset>")).alias("xml")
    )


def parse_sitemaps(maps_df: DataFrame, host_col: str = "host",
                   xml_col: str = "xml") -> DataFrame:
    """(host, xml) → (host, pos, loc, lastmod) — one row per entry with
    its 0-based in-document position.  Locs are XML-unescaped (the
    builder's escape inverse), so build→parse round-trips arbitrary
    URLs byte-exactly."""
    locs = F.regexp_extract_all(F.col(xml_col), F.lit("<loc>(.*?)</loc>"), 1)
    mods = F.regexp_extract_all(
        F.col(xml_col), F.lit("<lastmod>(.*?)</lastmod>"), 1
    )
    z = maps_df.select(
        host_col,
        F.posexplode(F.arrays_zip(locs.alias("l"), mods.alias("m"))).alias("pos", "e"),
    )
    return z.select(
        host_col, "pos",
        xml_unescape_col(F.col("e.l")).alias("loc"),
        F.col("e.m").alias("lastmod"),
    )


# ---------------------------------------------------------------------------
# Sitemap INDEX tier: the protocol caps a sitemap at 50 000 URLs /
# 50 MB, so a large host publishes numbered chunk sitemaps plus one
# <sitemapindex> document pointing at them.
# ---------------------------------------------------------------------------


def build_sitemap_chunks(pages_df: DataFrame, max_urls: int,
                         host_col: str = "host", order_col: str = "doc_id",
                         loc_col: str = "url", ts_col: str = "warc_ts") -> DataFrame:
    """(host, …) → (host, chunk, sitemap_loc, xml): per-host sitemaps of
    at most ``max_urls`` entries, chunked in ``order_col`` order.

    Chunk assignment is a per-host ROW_NUMBER window — the same
    host-keyed shuffle the unchunked build pays, so the index tier adds
    no new scale hazard; a mega-host is window skew on one key, which
    the protocol itself bounds (50k rows per chunk is the CONTENT of the
    window, but rank assignment still scans the host — at a true
    mega-host scale the order key is monotone-bucketable and the window
    becomes a per-bucket offset; documented, not needed at any test SF).
    ``sitemap_loc`` is the chunk document's own URL
    (https://<host>/sitemap-<chunk>.xml) — what the index lists and what
    a fetcher joins back on.
    """
    from pyspark.sql import Window

    if max_urls < 1:
        raise ValueError("max_urls must be >= 1")
    w = Window.partitionBy(host_col).orderBy(order_col)
    chunked = pages_df.withColumn(
        "chunk", ((F.row_number().over(w) - F.lit(1)) / F.lit(max_urls)).cast("int")
    )
    e = chunked.select(
        host_col, "chunk",
        F.struct(
            F.col(order_col).alias("k"),
            sitemap_entry_col(F.col(loc_col), F.col(ts_col)).alias("s"),
        ).alias("kv"),
        F.col(ts_col).alias("__ts"),
    )
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list("kv")), lambda x: x["s"]), ""
    )
    return e.groupBy(host_col, "chunk").agg(
        F.concat(
            F.lit("https://"), F.col(host_col), F.lit("/sitemap-"),
            F.col("chunk").cast("string"), F.lit(".xml"),
        ).alias("sitemap_loc"),
        F.concat(F.lit("<urlset>"), body, F.lit("</urlset>")).alias("xml"),
        F.max("__ts").alias("lastmod_ts"),
    )


def build_sitemap_index(chunks_df: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, chunk, sitemap_loc, lastmod_ts) → (host, xml): one
    `<sitemapindex>` per host listing its chunk sitemaps in chunk order
    (same sort-keyed ordered aggregation as the sitemap build)."""
    entry = F.concat(
        F.lit("<sitemap><loc>"), xml_escape_col(F.col("sitemap_loc")),
        F.lit("</loc><lastmod>"),
        F.date_format(F.col("lastmod_ts"), LASTMOD_FMT_SPARK),
        F.lit("</lastmod></sitemap>"),
    )
    e = chunks_df.select(
        host_col,
        F.struct(F.col("chunk").alias("k"), entry.alias("s")).alias("kv"),
    )
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list("kv")), lambda x: x["s"]), ""
    )
    return e.groupBy(host_col).agg(
        F.concat(F.lit("<sitemapindex>"), body, F.lit("</sitemapindex>")).alias("xml")
    )


def parse_sitemap_index(idx_df: DataFrame, host_col: str = "host",
                        xml_col: str = "xml") -> DataFrame:
    """(host, xml) → (host, chunk, sitemap_loc, lastmod): one row per
    child sitemap, ``chunk`` = 0-based position in the index — the
    discovery step a crawler runs before fetching the child maps."""
    locs = F.regexp_extract_all(F.col(xml_col), F.lit("<loc>(.*?)</loc>"), 1)
    mods = F.regexp_extract_all(
        F.col(xml_col), F.lit("<lastmod>(.*?)</lastmod>"), 1
    )
    z = idx_df.select(
        host_col,
        F.posexplode(F.arrays_zip(locs.alias("l"), mods.alias("m"))).alias("chunk", "e"),
    )
    return z.select(
        host_col, "chunk",
        xml_unescape_col(F.col("e.l")).alias("sitemap_loc"),
        F.col("e.m").alias("lastmod"),
    )
