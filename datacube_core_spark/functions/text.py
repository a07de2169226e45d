"""Text-analysis functions over the documents/pages corpus.

Large-scale-training-pipeline operators (task brief): language-ID
(stopword-marker heuristic), quality scoring, token counting, document
fingerprinting.  Everything here is pure Catalyst (no UDFs — these run in
whole-stage codegen at 100 TB), with a DuckDB-SQL twin for the oracle.

Parity notes (Spark Java regex vs DuckDB RE2 agree on the patterns used;
DuckDB ``regexp_replace`` needs the explicit ``'g'`` flag):
* tokenization: split(trim(text), '\\s+'), empty text → 0 tokens
* fingerprint: md5 of whitespace-normalized lowercase text (prefix 16)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed language marker sets (order = deterministic argmax tie-break)
LANGS = ("en", "de", "fr", "es", "zh")
MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "una", "por"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of trimmed text (lowercased for marker matching)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(F.split(F.trim(text), r"\s+")))


def _marker_score(toks: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores_col(text: Column) -> Column:
    toks = tokens_col(text)
    return F.array(*[_marker_score(toks, lg) for lg in LANGS])


def lang_id_col(text: Column) -> Column:
    """Predicted language: argmax of marker scores, first-wins tie-break,
    'und' (undetermined) when no marker hits."""
    scores = lang_scores_col(text)
    mx = F.array_max(scores)
    idx = F.array_position(scores, mx)  # 1-based first occurrence
    langs = F.array(*[F.lit(lg) for lg in LANGS])
    return F.when(mx <= 0, F.lit("und")).otherwise(F.element_at(langs, idx.cast("int")))


def punct_count_col(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[.!?]"))


def quality_score_col(text: Column) -> Column:
    """Deterministic quality heuristic in [0, ~3]: rewards sentence
    punctuation density and penalizes degenerate token lengths.
    score = min(1, punct/5) + min(1, tokens/100) + min(1, chars/(tokens*8))
    (guarded for empty docs)."""
    n_tok = token_count_col(text)
    n_chr = F.length(F.trim(text))
    punct = punct_count_col(text)
    s1 = F.least(F.lit(1.0), punct.cast("double") / F.lit(5.0))
    s2 = F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
    s3 = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), n_chr.cast("double") / (n_tok.cast("double") * F.lit(8.0)))
    )
    return s1 + s2 + s3


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text,
    16-hex-char prefix (the content-defined identity key for dedup)."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.substring(F.md5(F.encode(norm, "UTF-8")), 1, 16)


# BPE-ish pre-tokenization (GPT-2 style, minus contractions/lookahead so
# Java regex and RE2 agree): letter runs / digit runs / punctuation runs,
# each with an optional leading space
BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count_col(text: Column) -> Column:
    """Subword-ish token count: the BPE pre-tokenizer split count — the
    LLM-pipeline budget estimator (whitespace counts undercount CJK and
    punctuation-heavy docs)."""
    return F.regexp_count(text, F.lit(BPE_PAT))


# rolling-hash constants (same fold family as the LSH band hash — stays
# < 2^60 in BIGINT arithmetic, identical in Spark and DuckDB)
ROLL_MULT = 1000003
ROLL_MOD = 1 << 40


def rolling_fingerprint_col(text: Column) -> Column:
    """ORDER-SENSITIVE document fingerprint: Rabin–Karp polynomial rolling
    hash over the md5-derived 32-bit hashes of whitespace tokens —
    ``h = fold(acc·B + h32(tok) mod M)``.  Unlike :func:`fingerprint_col`
    (whole-content md5), this is incrementally maintainable over token
    streams and cheap to window over prefixes; 0 for empty text."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    h32 = lambda t: F.conv(F.substring(F.md5(F.encode(t, "UTF-8")), 1, 8), 16, 10).cast("long")
    fold = F.aggregate(
        F.transform(toks, h32),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(ROLL_MULT) + x) % F.lit(ROLL_MOD),
    )
    return F.when(F.trim(text) == "", F.lit(0).cast("long")).otherwise(fold)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def sql_token_count(col: str = "text") -> str:
    return (
        f"CASE WHEN trim({col}) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim({col}), '\\s+')) END"
    )


def sql_tokens(col: str = "text") -> str:
    """Twin of :func:`tokens_col` (lowercased whitespace tokens)."""
    return f"string_split_regex(lower(trim({col})), '\\s+')"


def sql_tokenized_cte(src: str = "corpus", col: str = "text") -> str:
    """The shared ``tk(doc_id, toks, len)`` CTE body both retrieval twins
    (BM25, span dedup) build on — ONE definition so a tokenizer tweak
    cannot silently diverge the contracts.

    Cross-engine caveat (applies to every ``\\s`` twin in this module):
    Java's ``\\s`` includes vertical tab ``\\x0B``; RE2's does not.  A
    document containing ``\\x0B`` tokenizes differently between Spark and
    DuckDB — the synthetic corpus contains none, and real corpora should
    normalize control characters upstream."""
    return f"""tk AS (
  SELECT doc_id,
         {sql_tokens(col)} AS toks,
         CASE WHEN trim({col}) = '' THEN 0
              ELSE len({sql_tokens(col)}) END AS len
  FROM {src}
)"""


def sql_lang_scores(col: str = "text") -> str:
    toks = f"string_split_regex(lower(trim({col})), '\\s+')"
    parts = []
    for lg in LANGS:
        words = ", ".join(f"'{w}'" for w in MARKERS[lg])
        parts.append(f"len(list_filter({toks}, x -> x IN ({words})))")
    return "[" + ", ".join(parts) + "]"


def sql_lang_id(col: str = "text") -> str:
    scores = sql_lang_scores(col)
    langs = "[" + ", ".join(f"'{lg}'" for lg in LANGS) + "]"
    return (
        f"CASE WHEN list_aggregate({scores}, 'max') <= 0 THEN 'und' "
        f"ELSE {langs}[list_position({scores}, list_aggregate({scores}, 'max'))] END"
    )


def sql_punct_count(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '[.!?]'))"


def sql_quality_score(col: str = "text") -> str:
    n_tok = sql_token_count(col)
    return (
        f"least(1.0, {sql_punct_count(col)} / 5.0)"
        f" + least(1.0, ({n_tok}) / 100.0)"
        f" + (CASE WHEN ({n_tok}) = 0 THEN 0.0 ELSE"
        f" least(1.0, length(trim({col})) / (({n_tok}) * 8.0)) END)"
    )


def sql_fingerprint(col: str = "text") -> str:
    return f"substring(md5(lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))), 1, 16)"


def sql_bpe_token_count(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{BPE_PAT}'))"


def sql_rolling_fingerprint(col: str = "text") -> str:
    toks = f"string_split_regex(lower(trim({col})), '\\s+')"
    h32 = "CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)"
    hashed = f"list_transform({toks}, t -> {h32})"
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hashed}), "
        f"(acc, x) -> (acc * {ROLL_MULT} + x) % {ROLL_MOD})"
    )
    return f"CASE WHEN trim({col}) = '' THEN 0 ELSE {fold} END"


# ---------------------------------------------------------------------------
# repetition metrics (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def repetition_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document repetition metrics (the Gopher/C4 repetition filters):

    * ``n_tokens``       — whitespace token count
    * ``top_word_frac``  — share of tokens taken by the single most
      frequent word (Gopher: "fraction in the most common n-gram", n=1)
    * ``dup_bigram_frac``— share of bigram INSTANCES whose bigram occurs
      more than once in the document

    Plan shape: explode → two hash aggregations keyed on (doc, gram) then
    (doc) — every shuffle key includes the doc id, so per-doc work stays
    fully parallel and no document ever concentrates on one task beyond
    its own length.  No Python.  DuckDB twin: :func:`sql_repetition_cte`
    (entry ``repetition_stats``)."""
    # tokenize ONCE and materialize: both metric branches (word counts,
    # bigram counts) consume the token table — un-checkpointed the scan +
    # split runs twice (guide §2.4/§5; measured 2.0s → 0.8s at sf0.1)
    toks = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("ws")
    ).localCheckpoint(eager=False)
    words = toks.select("_id", F.explode("ws").alias("w"))
    wc = words.groupBy("_id", "w").agg(F.count("*").alias("c"))
    top = wc.groupBy("_id").agg(
        F.max("c").alias("_top_c"), F.sum("c").alias("n_tokens")
    )
    bigrams = toks.select(
        "_id",
        F.expr(
            "transform(slice(ws, 1, greatest(size(ws) - 1, 0)),"
            " (x, i) -> concat(x, ' ', element_at(ws, i + 2)))"
        ).alias("bgs"),
    ).select("_id", F.explode("bgs").alias("bg"))
    bc = bigrams.groupBy("_id", "bg").agg(F.count("*").alias("c"))
    dup = bc.groupBy("_id").agg(
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).alias("_dup_inst"),
        F.sum("c").alias("_n_bg"),
    )
    out = top.join(dup, on="_id", how="left")
    return out.select(
        F.col("_id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("_top_c").cast("double") / F.col("n_tokens")).alias("top_word_frac"),
        F.coalesce(
            F.col("_dup_inst").cast("double")
            / F.when(F.col("_n_bg") > 0, F.col("_n_bg")),
            F.lit(0.0),
        ).alias("dup_bigram_frac"),
    )


def sql_repetition_cte(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB twin of :func:`repetition_stats` (same metric definitions,
    same division order — exact hash parity)."""
    return f"""
WITH t AS (
  SELECT {id_col} AS _id, string_split({text_col}, ' ') AS ws FROM {table}
), wc AS (
  SELECT _id, w, COUNT(*) AS c FROM (SELECT _id, unnest(ws) AS w FROM t) GROUP BY 1, 2
), top AS (
  SELECT _id, MAX(c) AS top_c, SUM(c) AS n_tokens FROM wc GROUP BY 1
), bg AS (
  SELECT t._id, ws[i] || ' ' || ws[i + 1] AS bg
  FROM t, unnest(range(1, len(ws))) AS r(i)
), bc AS (
  SELECT _id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2
), dup AS (
  SELECT _id, SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_inst, SUM(c) AS n_bg
  FROM bc GROUP BY 1
)
SELECT top._id AS {id_col},
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(top_c AS DOUBLE) / n_tokens AS top_word_frac,
       COALESCE(CAST(dup_inst AS DOUBLE) / (CASE WHEN n_bg > 0 THEN n_bg END), 0.0) AS dup_bigram_frac
FROM top LEFT JOIN dup ON top._id = dup._id
"""
