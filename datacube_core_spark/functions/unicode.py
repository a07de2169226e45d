"""Unicode normalization for web-text ingest (NFC et al.).

Crawled text arrives in mixed normalization forms (decomposed accents
from mac filesystems / some CMSes, compatibility singletons like the
ANGSTROM and OHM signs, decomposed Hangul jamo); dedup fingerprints,
tokenizers, and exact-match joins all require one canonical form, so a
large-scale training pipeline normalizes to NFC at ingest.

Spark has no built-in Unicode normalizer, so this is a legitimate
Python-UDF seam — but a VECTORIZED one: an Arrow ``pandas_udf`` batching
through ``unicodedata`` (the CPython UCD tables).  The DuckDB oracle
twin uses DuckDB's OWN ``nfc_normalize`` (utf8proc) — two genuinely
independent Unicode implementations; agreement on the adversarial
decomposed suffixes below is a real cross-check, not a replay.

Scale shape: embarrassingly parallel map, no shuffle; Arrow batches keep
the Python boundary amortized (the plan gate allows ArrowEvalPython,
bans row-at-a-time BatchEvalPython).  At 100 TB this runs fused into the
ingest scan-project stage.

Reference analog: none (ODC payloads are rasters); webtext-axis
capability alongside ``functions/text.py``.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Adversarial non-NFC sequences (all composition-stable across Unicode
# versions), plus already-NFC controls.  Index order is load-bearing:
# both engines select variants[doc_id % len] — keep the SQL twin in sync.
DECOMPOSED_VARIANTS = (
    "e\u0301",        # e + COMBINING ACUTE        -> U+00E9
    "a\u0300",        # a + COMBINING GRAVE        -> U+00E0
    "o\u0308",        # o + COMBINING DIAERESIS    -> U+00F6
    "A\u030a",        # A + COMBINING RING ABOVE   -> U+00C5
    "\u212b",         # ANGSTROM SIGN (singleton)  -> U+00C5
    "\u1100\u1161",   # Hangul jamo G + A          -> U+AC00
    "\u00e9",         # precomposed e-acute (no-change control)
    "",               # empty (identity control)
)


def normalize_col(col: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column via an Arrow-batched UDF."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(form)

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(col)


def decomposed_suffix_col(doc_id: Column) -> Column:
    """variants[doc_id % len] — the deterministic adversarial suffix."""
    arr = F.array(*[F.lit(v) for v in DECOMPOSED_VARIANTS])
    return F.element_at(arr, (doc_id % len(DECOMPOSED_VARIANTS) + 1).cast("int"))


def sql_decomposed_suffix(docid_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`decomposed_suffix_col` (1-based list index)."""
    items = ", ".join("'" + v.replace("'", "''") + "'" for v in DECOMPOSED_VARIANTS)
    return f"([{items}])[CAST({docid_col} % {len(DECOMPOSED_VARIANTS)} + 1 AS INT)]"
