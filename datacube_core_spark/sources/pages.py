"""Deterministic synthetic `pages` table (Common-Crawl-style web pages).

``BASELINE.json.input_hint`` mandates an input table of shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data is allowed, so pages are synthesized *deterministically*
from the driver-provided ``documents`` parquet (``doc_id, text, lang``
columns) with pure-arithmetic derivations that are expressible identically
in Spark SQL and DuckDB SQL — this is what lets the driver's DuckDB oracle
verify every spatial operator end-to-end (CORRECTNESS gate).

The geocode step (lon/lat from doc_id) mirrors the reference's EO3 spatial
normalization (reference ``datacube/index/eo3.py:77-157``: every row gets
canonical spatial columns before indexing), with FIXTURES.md §1's skew
injection: 20% of rows land in 3 hot ~0.5° boxes (dense URL clusters) to
exercise salting / AQE skew handling.

IEEE-754 note: every derived value is (integer op chain) followed by a
single divide + add, so Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datacube_core_spark.functions.html import escape_html_col, sql_escape_html

# --- geocode constants (single source of truth; mirrored in SQL below) ---
LON_MULT = 2654435761  # Knuth multiplicative hash constant
LAT_MULT = 1103515245  # glibc LCG constant
LAT_ADD = 12345
TS_MULT = 9973
TS_MOD = 31536000  # seconds per year
TS_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

HOT_LON = (2.0, -74.0, 116.0)  # Paris / NYC / Beijing-ish cluster centers
HOT_LAT = (48.0, 40.0, 39.0)

# per-page bbox half-size (pages get a small footprint for bbox→tiles tests)
BBOX_W_BASE = 0.05
BBOX_W_STEP = 0.01

# --- html payload template (single source of truth for the Spark builder
# and the DuckDB twin below).  A realistic page: head with title, a style
# block, a script block whose content contains '<' '&' and quotes (so a
# naive tag-stripper fails), a comment, boilerplate (h1 + nav anchor), and
# the page text ENTITY-ESCAPED inside the main <p> — which is what makes
# functions/html.extract_text_col's round-trip byte-exact for ANY text.
# Must start with b"<html>": media_stats sniffs the first 6 bytes.
HTML_P1 = "<html><head><title>page "  # + doc_id
HTML_P2 = (
    '</title><style>p.main{margin:0}</style>'
    '<script type="text/javascript">var n=1;if(n<2){n="&x";}</script>'
    '</head><body><!-- crawl snapshot --><h1>crawl</h1><p class="main">'
)  # + escape_html(text)
HTML_P3 = '</p><a href="'  # + url
HTML_P4 = '">next</a>'  # + outlink anchors + HTML_P5
HTML_P5 = "</body></html>"

# --- deterministic outlink graph (3 anchors per page) ---------------------
# Every page links to exactly 3 other pages (uniform outdegree — the
# exact-integer PageRank in operators/graph.py depends on it).  Targets
# are valid uids: with D = |documents| (dynamic — 500 at sf0.001/0.01,
# 5000 at sf0.1; doc_ids are contiguous 0..D-1 at every SF), index
# j ∈ [0, repl·D) → uid = (j // D)·stride + (j % D), with
# j = (doc_id · M_k + k) % (repl·D).  D MUST come from the data, not a
# constant: a stale constant smaller than the table silently starves
# most nodes of indegree and skews every graph entry at that SF.  The
# Spark side counts the parquet (footer-only, ~ms); the SQL twin embeds
# a (SELECT COUNT(*) FROM documents) scalar subquery so both engines
# derive the SAME D at any SF.  The '/out/' path segment distinguishes
# outlinks from the self 'next' anchor.
OUTLINK_MULTS = (7919, 104729, 15485863)
SQL_N_DOCS = "(SELECT COUNT(*) FROM documents)"
_N_DOCS_CACHE: dict = {}


def _base_lon(doc_id: Column) -> Column:
    return ((doc_id * F.lit(LON_MULT)) % F.lit(360000000)) / F.lit(1000000.0) - F.lit(180.0)


def _base_lat(doc_id: Column) -> Column:
    return ((doc_id * F.lit(LAT_MULT) + F.lit(LAT_ADD)) % F.lit(170000000)) / F.lit(1000000.0) - F.lit(85.0)


def _hot(doc_id: Column, centers, frac_mult: int) -> Column:
    k = doc_id % F.lit(3)
    center = (
        F.when(k == 0, F.lit(centers[0]))
        .when(k == 1, F.lit(centers[1]))
        .otherwise(F.lit(centers[2]))
    )
    return center + (F.floor(doc_id / F.lit(frac_mult)) % F.lit(1000)) / F.lit(2000.0)


def lon_expr(doc_id: Column) -> Column:
    return F.when(doc_id % 5 == 0, _hot(doc_id, HOT_LON, 5)).otherwise(_base_lon(doc_id))


def lat_expr(doc_id: Column) -> Column:
    return F.when(doc_id % 5 == 0, _hot(doc_id, HOT_LAT, 7)).otherwise(_base_lat(doc_id))


REPL_STRIDE = 100_000  # uid = rep * REPL_STRIDE + doc_id; requires doc_id < stride

# uid * LON_MULT must not overflow int64 (DuckDB raises on overflow, Spark
# wraps — either way parity would break): uid < 2^63 / LON_MULT ≈ 3.47e9.
MAX_REPL = 34_000


def pages(spark: SparkSession, sf_dir: str, repl: int = 1, stride: int = REPL_STRIDE,
          n_docs: int | None = None) -> DataFrame:
    """Load documents parquet and derive the full pages table.

    ``repl`` replicates each document deterministically (uid = rep *
    REPL_STRIDE + doc_id) so page volume can scale past the small
    driver-provided documents table; every derived column is a pure
    function of uid, so any replication level stays oracle-checkable.

    ``n_docs`` sizes the outlink target space (repl·n_docs uids); by
    default it is counted from the parquet footer (~ms) so the link
    graph covers the WHOLE table at every SF — pass it only to avoid
    the count when the value is already known.

    Column pruning matters at scale: ``html`` is built lazily from ``text``
    and Catalyst drops it unless a query asks for it (SURVEY §4: the
    ``html:binary`` column must never be read unless needed).
    """
    # uid*LON_MULT must stay within int64: uid < 2^63 / LON_MULT ≈ 3.47e9
    assert repl >= 1 and repl * stride < 3_400_000_000, "repl*stride too large (int64 overflow)"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if n_docs is None:
        # memoized per sf_dir: testdata is immutable, and ~70 entry
        # queries call pages() — one footer-count job total, not one per
        # query build
        n_docs = _N_DOCS_CACHE.get(sf_dir)
        if n_docs is None:
            n_docs = docs.count()
            _N_DOCS_CACHE[sf_dir] = n_docs
    # doc_ids must be contiguous [0, n_docs) and fit under the stride for
    # the uid arithmetic to be a bijection (true of every driver SF)
    assert 0 < n_docs <= stride, (n_docs, stride)
    if repl > 1:
        # The documents parquet is one small file -> one input split; the
        # replication explode would otherwise fan out inside a SINGLE task
        # and serialize the whole pipeline.  Round-robin the seed rows
        # across the cluster first (tiny shuffle, unlocks full parallelism
        # for everything downstream — this is the local analog of reading
        # a many-file Iceberg table).
        n_parts = spark.sparkContext.defaultParallelism * 2
        docs = docs.repartition(n_parts)
        docs = docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
        d = F.col("rep").cast("long") * F.lit(stride) + F.col("doc_id")
    else:
        d = F.col("doc_id")
    url = F.concat(
        F.lit("https://site"), (d % 97).cast("string"), F.lit(".example/"),
        F.col("lang"), F.lit("/page/"), d.cast("string"),
    )
    anchors = []
    n_uid = repl * n_docs
    for k, m in enumerate(OUTLINK_MULTS):
        j = (d * F.lit(m) + F.lit(k)) % F.lit(n_uid)
        tgt = F.floor(j / F.lit(n_docs)) * F.lit(stride) + (j % F.lit(n_docs))
        anchors += [
            F.lit('<a href="https://site'), (tgt % 97).cast("string"),
            F.lit(".example/out/"), tgt.cast("string"),
            F.lit(f'">o{k}</a>'),
        ]
    html = F.encode(
        F.concat(
            F.lit(HTML_P1), d.cast("string"), F.lit(HTML_P2),
            escape_html_col(F.col("text")),
            F.lit(HTML_P3), url, F.lit(HTML_P4),
            *anchors,
            F.lit(HTML_P5),
        ),
        "UTF-8",
    )
    return docs.select(
        d.alias("doc_id"),
        url.alias("url"),
        F.timestamp_seconds(F.lit(TS_EPOCH) + (d * TS_MULT) % TS_MOD).alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
        lon_expr(d).alias("lon"),
        lat_expr(d).alias("lat"),
    )


def boxed_pages(df: DataFrame) -> DataFrame:
    """Pages with a small per-page footprint bbox (for grid-range joins).

    Half-width w = 0.05 + (doc_id % 10) * 0.01 — integer-arithmetic-derived
    so the DuckDB oracle reproduces it exactly.
    """
    w = F.lit(BBOX_W_BASE) + (F.col("doc_id") % 10).cast("double") * F.lit(BBOX_W_STEP)
    return df.select(
        "doc_id",
        (F.col("lon") - w).alias("left"),
        (F.col("lat") - w).alias("bottom"),
        (F.col("lon") + w).alias("right"),
        (F.col("lat") + w).alias("top"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: the same pages derivation as a CTE prefix.  Every oracle
# query in __spark_entry__.oracle_sql() starts with this, so the two engines
# compute from identical inputs.
# ---------------------------------------------------------------------------

def pages_cte(repl: int = 1) -> str:
    if repl > 1:
        src = (
            f"(SELECT rep * {REPL_STRIDE} + doc_id AS doc_id, text, lang FROM documents, "
            f"UNNEST(generate_series(0, {repl - 1})) AS r(rep))"
        )
    else:
        src = "(SELECT doc_id, text, lang FROM documents)"
    return f"""
WITH pages AS (
  SELECT
    doc_id,
    'https://site' || CAST(doc_id % 97 AS VARCHAR) || '.example/' || lang || '/page/' || CAST(doc_id AS VARCHAR) AS url,
    TIMESTAMP '2024-01-01 00:00:00' + ((doc_id * {TS_MULT}) % {TS_MOD}) * INTERVAL 1 SECOND AS warc_ts,
    text,
    lang,
    CASE WHEN doc_id % 5 = 0 THEN
      (CASE doc_id % 3 WHEN 0 THEN {HOT_LON[0]} WHEN 1 THEN {HOT_LON[1]} ELSE {HOT_LON[2]} END)
        + (CAST(FLOOR(doc_id / 5) AS BIGINT) % 1000) / 2000.0
    ELSE ((doc_id * {LON_MULT}) % 360000000) / 1000000.0 - 180.0 END AS lon,
    CASE WHEN doc_id % 5 = 0 THEN
      (CASE doc_id % 3 WHEN 0 THEN {HOT_LAT[0]} WHEN 1 THEN {HOT_LAT[1]} ELSE {HOT_LAT[2]} END)
        + (CAST(FLOOR(doc_id / 7) AS BIGINT) % 1000) / 2000.0
    ELSE ((doc_id * {LAT_MULT} + {LAT_ADD}) % 170000000) / 1000000.0 - 85.0 END AS lat
  FROM {src}
)
"""


PAGES_CTE = pages_cte(1)


def sql_html_expr(text_col: str = "text", url_col: str = "url",
                  docid_col: str = "doc_id", repl: int = 1,
                  stride: int = REPL_STRIDE,
                  n_docs: str | int = SQL_N_DOCS) -> str:
    """DuckDB expression for the html payload (VARCHAR — the binary
    encode step is a no-op for the comparison since both engines hash
    the UTF-8 bytes).  Mirrors the Spark builder in :func:`pages`
    term-for-term from the same HTML_P*/OUTLINK_* constants; ``repl``
    must match the ``pages()`` call the oracle replays.  ``n_docs``
    defaults to the COUNT(*) scalar subquery so the twin derives the
    SAME dynamic target-space size as the Spark side at any SF."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    n_uid = f"({repl} * {n_docs})"
    anchors = []
    for k, m in enumerate(OUTLINK_MULTS):
        j = f"(({docid_col} * {m} + {k}) % {n_uid})"
        tgt = f"(CAST(FLOOR({j} / {n_docs}) AS BIGINT) * {stride} + ({j} % {n_docs}))"
        anchors.append(
            f"'<a href=\"https://site' || CAST({tgt} % 97 AS VARCHAR) || "
            f"'.example/out/' || CAST({tgt} AS VARCHAR) || '\">o{k}</a>'"
        )
    return (
        f"{q(HTML_P1)} || CAST({docid_col} AS VARCHAR) || {q(HTML_P2)} || "
        f"{sql_escape_html(text_col)} || {q(HTML_P3)} || {url_col} || {q(HTML_P4)} || "
        + " || ".join(anchors)
        + f" || {q(HTML_P5)}"
    )
