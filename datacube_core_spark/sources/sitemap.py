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
sitemap per host), then shuffle-free maps.  Entry values are NOT
XML-escaped: the synthetic URLs carry no `&<>` and a guard raises on
any that would need escaping (a production writer adds the five XML
entities; the parse side would mirror it).

Reference analog: none in ODC; webtext-axis source family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LASTMOD_FMT_SPARK = "yyyy-MM-dd"
LASTMOD_FMT_DUCK = "%Y-%m-%d"
_NEEDS_ESCAPE = "[&<>]"


def sitemap_entry_col(loc: Column, lastmod_ts: Column) -> Column:
    """One `<url>` entry; raises at runtime on a loc needing XML escaping."""
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
                   ts_col: str = "warc_ts") -> DataFrame:
    """(host, …) → (host, xml): one sitemap per host, entries in
    ``order_col`` order via sort-keyed collect_list (no per-host python,
    no global sort)."""
    e = pages_df.select(
        host_col,
        F.struct(
            F.col(order_col).alias("k"),
            sitemap_entry_col(F.col(loc_col), F.col(ts_col)).alias("s"),
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
    its 0-based in-document position."""
    locs = F.regexp_extract_all(F.col(xml_col), F.lit("<loc>(.*?)</loc>"), 1)
    mods = F.regexp_extract_all(
        F.col(xml_col), F.lit("<lastmod>(.*?)</lastmod>"), 1
    )
    z = maps_df.select(
        host_col,
        F.posexplode(F.arrays_zip(locs.alias("l"), mods.alias("m"))).alias("pos", "e"),
    )
    return z.select(
        host_col, "pos", F.col("e.l").alias("loc"), F.col("e.m").alias("lastmod")
    )
