"""robots.txt (Robots Exclusion Protocol) URL filtering.

Crawl pipelines must drop pages a site's robots.txt disallows.  This
implements the REP matching semantics per the published Google/RFC 9309
spec: rules are (Allow|Disallow, path-pattern) pairs; a pattern matches
as a PREFIX of the URL path, ``*`` matches any span, ``$`` anchors the
pattern end; among matching rules the LONGEST PATTERN wins, and on an
exact length tie Allow wins (least-restrictive).  No rule matching ⇒
allowed.

Everything is pure Catalyst: each rule compiles to one anchored regex
(spec wildcards only — the escaped-literal + ``.*`` + ``$`` subset is
identical in Java regex and RE2, so the DuckDB twin uses the SAME
string), and the longest-match/tie-break decision folds into a single
``greatest()`` over per-rule scores (pattern_len·2 + is_allow) — no UDF,
whole-stage codegen, embarrassingly parallel at 100 TB.  Rule sets are
compile-time literals (robots.txt files are tiny and broadcastable by
construction).

Reference analog: none in ODC; webtext-axis policy filtering alongside
``sources/corpus.py`` curation.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

Rule = Tuple[bool, str]  # (is_allow, pattern)


def rule_regex(pattern: str, dialect: str = "re2java") -> str:
    """REP pattern → anchored regex.

    ``*`` → ``.*``; a trailing ``$`` anchors the end; everything else is
    escaped literally.  Prefix semantics: anchored at path start only.

    The end anchor is emitted as ``\\z`` (absolute end of text), NOT
    ``$``: Java regex matches ``$`` BEFORE a trailing newline while RE2
    matches only at end-of-text, so ``$`` would silently diverge the
    engines on a path with a trailing ``\\n`` (e.g. percent-decoded
    %0A).  ``\\z`` means absolute-end in both Java and RE2; Python's
    ``re`` spells the same thing ``\\Z``, hence the dialect switch for
    the pure-python reference.
    """
    if dialect not in ("re2java", "python"):
        raise ValueError(dialect)
    end_anchor = pattern.endswith("$")
    body = pattern[:-1] if end_anchor else pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts)
    if not end_anchor:
        return rx
    return rx + (r"\Z" if dialect == "python" else r"\z")


def _scores(path: Column, rules: Sequence[Rule]):
    # score = pattern_len*2 + is_allow: longest pattern wins, Allow wins ties
    out = [F.lit(-1)]
    for is_allow, pattern in rules:
        score = len(pattern) * 2 + (1 if is_allow else 0)
        out.append(
            F.when(path.rlike(rule_regex(pattern)), F.lit(score)).otherwise(F.lit(-1))
        )
    return out


def robots_best_score(path: Column, rules: Sequence[Rule]) -> Column:
    """greatest() of per-rule scores; -1 when no rule matches."""
    return F.greatest(*_scores(path, rules)) if rules else F.lit(-1)


def robots_allowed(path: Column, rules: Sequence[Rule]) -> Column:
    """True iff the REP decision for ``path`` under ``rules`` is Allow."""
    best = robots_best_score(path, rules)
    return (best == F.lit(-1)) | (best % 2 == 1)


def robots_allowed_py(path: str, rules: Sequence[Rule]) -> bool:
    """Pure-python reference of the same semantics (for tests/fuzz)."""
    best = -1
    for is_allow, pattern in rules:
        if re.search(rule_regex(pattern, dialect="python"), path):
            best = max(best, len(pattern) * 2 + (1 if is_allow else 0))
    return best == -1 or best % 2 == 1


# ---------------------------------------------------------------------------
# DuckDB twins — the same regex strings, the same score fold
# ---------------------------------------------------------------------------

def sql_robots_best_score(path_expr: str, rules: Sequence[Rule]) -> str:
    if not rules:
        return "-1"
    terms = ["-1"]
    for is_allow, pattern in rules:
        score = len(pattern) * 2 + (1 if is_allow else 0)
        rx = rule_regex(pattern).replace("'", "''")
        terms.append(
            f"CASE WHEN regexp_matches({path_expr}, '{rx}') THEN {score} ELSE -1 END"
        )
    return "greatest(" + ", ".join(terms) + ")"


def sql_robots_allowed(path_expr: str, rules: Sequence[Rule]) -> str:
    best = sql_robots_best_score(path_expr, rules)
    return f"((({best}) = -1) OR (({best}) % 2 = 1))"
