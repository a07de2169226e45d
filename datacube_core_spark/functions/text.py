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
