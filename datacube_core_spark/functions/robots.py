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
# robots.txt FILE parsing — fully relational (RFC 9309 group model)
# ---------------------------------------------------------------------------
#
# A robots.txt file is line-oriented: `key: value` lines, `#` comments,
# groups opened by one or more User-agent lines.  Group selection: the
# crawler uses the group(s) whose agent token equals its own product
# token (case-insensitive); only if NO exact group exists anywhere in
# the file do the `*` groups apply; a file with neither yields no rules
# (everything allowed).  All of it is expressible relationally —
# posexplode lines, a running SUM window assigns each line to its
# group, two small aggs pick the applicable groups — so parsing runs
# distributed over millions of per-host files with no UDF.  The rule
# patterns then compile to regexes DYNAMICALLY (data-dependent, so
# chained replace, not re.escape): a validated subset (letters, digits,
# `_-./` plus `*` and a trailing `$`) is accepted and anything else
# raises at runtime via raise_error.

# dynamic-pattern vocabulary: the only regex-special characters a
# pattern may contain are '.', '*' and one trailing '$'
_PATTERN_OK = r"^[A-Za-z0-9_\-./*]*\$?$"


def _chosen_lines(files_df, agent: str, host_col: str, txt_col: str):
    """(host, txt) → the key/value lines of the group(s) applicable to
    ``agent`` (shared by rule and crawl-delay extraction)."""
    from pyspark.sql import Window

    ln = files_df.select(
        host_col, F.posexplode(F.split(F.col(txt_col), "\n")).alias("ord", "raw")
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    ln = ln.select(host_col, "ord", clean.alias("clean")).where(
        (F.col("clean") != "") & (F.instr(F.col("clean"), ":") > 0)
    )
    ln = ln.select(
        host_col,
        "ord",
        F.lower(F.trim(F.substring_index(F.col("clean"), ":", 1))).alias("key"),
        F.trim(F.expr("substring(clean, instr(clean, ':') + 1)")).alias("val"),
    )
    # consecutive User-agent lines open ONE shared group (RFC 9309), so
    # the group counter increments only at the START of a UA run
    wl = Window.partitionBy(host_col).orderBy("ord")
    is_ua = F.col("key") == "user-agent"
    ua_start = is_ua & ~F.coalesce(F.lag(is_ua).over(wl), F.lit(False))
    w = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ln = ln.withColumn("g", F.sum(ua_start.cast("int")).over(w))
    agents = (
        ln.where(F.col("key") == "user-agent")
        .groupBy(host_col, "g")
        .agg(
            F.max((F.lower(F.col("val")) == agent.lower()).cast("int")).alias("x"),
            F.max((F.col("val") == "*").cast("int")).alias("s"),
        )
    )
    host_exact = agents.groupBy(host_col).agg(F.max("x").alias("he"))
    chosen = (
        agents.join(host_exact, host_col)
        .where(F.when(F.col("he") == 1, F.col("x") == 1).otherwise(F.col("s") == 1))
        .select(host_col, "g")
    )
    return ln.join(chosen, [host_col, "g"])


def parse_robots_df(files_df, agent: str, host_col: str = "host",
                    txt_col: str = "txt"):
    """(host, txt) → (host, is_allow, pattern, rx) applicable to ``agent``."""
    rules = (
        _chosen_lines(files_df, agent, host_col, txt_col)
        .where(F.col("key").isin("allow", "disallow") & (F.col("val") != ""))
        .select(
            host_col,
            (F.col("key") == "allow").alias("is_allow"),
            F.col("val").alias("pattern"),
        )
    )
    anchored = F.col("pattern").endswith("$")
    body = F.when(
        anchored, F.expr("substring(pattern, 1, length(pattern) - 1)")
    ).otherwise(F.col("pattern"))
    rx = F.concat(
        F.lit("^"),
        F.replace(F.replace(body, F.lit("."), F.lit(r"\.")), F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit(r"\z")).otherwise(F.lit("")),
    )
    guarded = F.when(F.col("pattern").rlike(_PATTERN_OK), rx).otherwise(
        F.raise_error(
            F.concat(F.lit("unsupported robots.txt pattern: "), F.col("pattern"))
        )
    )
    return rules.withColumn("rx", guarded)


def parse_crawl_delay_df(files_df, agent: str, default_s: int = 1,
                         host_col: str = "host", txt_col: str = "txt"):
    """(host, txt) → (host, delay_s) from the applicable group's
    ``Crawl-delay`` directive (a de-facto-standard extension honored by
    most crawlers; not in RFC 9309).  When the applicable groups carry
    several, the MAX (most polite) wins; non-numeric values are ignored;
    hosts without one get ``default_s``.  Consumers must re-join hosts
    for the default — this returns only directive-bearing hosts."""
    return (
        _chosen_lines(files_df, agent, host_col, txt_col)
        .where((F.col("key") == "crawl-delay") & F.col("val").rlike(r"^\d+$"))
        .groupBy(host_col)
        .agg(F.max(F.col("val").cast("long")).alias("delay_s"))
    )


def crawl_schedule_df(pages_df, delays_df, default_s: int = 1,
                      host_col: str = "host", ts_col: str = "ts",
                      id_col: str = "doc_id"):
    """Politeness schedule: within each host, pages fetch in (ts, id)
    order, one fetch per ``delay_s`` — fetch_offset_s = rank·delay.

    Scale shape: ONE window per host; politeness is inherently per-host
    sequential, so the window partition mirrors the real-world
    constraint (a host with millions of queued pages IS the crawl
    bottleneck — no plan can parallelize politeness away, only the
    per-host stream order matters).  Delays are a broadcast dimension.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    j = pages_df.join(F.broadcast(delays_df), on=host_col, how="left")
    return j.select(
        id_col,
        host_col,
        (F.row_number().over(w) - 1).alias("rank"),
        F.coalesce(F.col("delay_s"), F.lit(default_s)).alias("delay_s"),
    ).withColumn("fetch_offset_s", F.col("rank") * F.col("delay_s"))


def robots_decisions_df(pages_df, rules_df, host_col: str = "host",
                        path_col: str = "path",
                        id_cols: Sequence[str] = ("doc_id",)):
    """Join per-host rules onto pages and fold the REP decision.

    Rules are a tiny dimension (one file per host) — broadcast; the
    per-(page, rule) match uses a DATA-DEPENDENT regex (regexp_like with
    a column pattern — no codegen, but still JVM-side and shuffle-free),
    then one groupBy(max) per page keeps the winning rule's score."""
    j = pages_df.join(F.broadcast(rules_df), on=host_col, how="left")
    score = F.when(
        F.col("rx").isNotNull() & F.expr(f"regexp_like({path_col}, rx)"),
        F.length("pattern") * F.lit(2) + F.col("is_allow").cast("int"),
    ).otherwise(F.lit(-1))
    out = j.groupBy(*id_cols).agg(F.max(score).cast("int").alias("best_score"))
    return out.select(
        *id_cols,
        "best_score",
        ((F.col("best_score") == -1) | (F.col("best_score") % 2 == 1)).alias("allowed"),
    )


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


def sql_parse_robots(files_cte: str, agent: str, host_col: str = "host",
                     txt_col: str = "txt") -> str:
    """DuckDB twin of :func:`parse_robots_df`: CTE chain ending in
    ``rb_rx(host, is_allow, pattern, rxs)``.  Line enumeration uses a
    list index over generate_series (DuckDB lacks WITH ORDINALITY); the
    group window, agent selection, and dynamic regex build mirror the
    Spark plan step for step."""
    a = agent.lower().replace("'", "''")
    return f"""rb_lines AS (
  SELECT {host_col} AS host, i AS ord,
         trim(regexp_replace(parts[i], '#.*$', '')) AS clean
  FROM (SELECT {host_col}, string_split({txt_col}, chr(10)) AS parts FROM {files_cte}),
       UNNEST(generate_series(1, len(parts))) AS t(i)
),
rb_kv AS (
  SELECT host, ord,
         lower(trim(split_part(clean, ':', 1))) AS key,
         trim(substr(clean, strpos(clean, ':') + 1)) AS val
  FROM rb_lines WHERE clean <> '' AND strpos(clean, ':') > 0
),
rb_grp AS (
  -- consecutive User-agent lines open ONE group: count UA-run starts
  SELECT * EXCLUDE (ua, prev_ua),
         SUM(CASE WHEN ua AND NOT COALESCE(prev_ua, FALSE) THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY ord) AS g
  FROM (
    SELECT *, key = 'user-agent' AS ua,
           LAG(key = 'user-agent') OVER (PARTITION BY host ORDER BY ord) AS prev_ua
    FROM rb_kv
  )
),
rb_agents AS (
  SELECT host, g,
         MAX(CASE WHEN lower(val) = '{a}' THEN 1 ELSE 0 END) AS x,
         MAX(CASE WHEN val = '*' THEN 1 ELSE 0 END) AS s
  FROM rb_grp WHERE key = 'user-agent' GROUP BY 1, 2
),
rb_he AS (SELECT host, MAX(x) AS he FROM rb_agents GROUP BY 1),
rb_chosen AS (
  SELECT a.host, a.g FROM rb_agents a JOIN rb_he h USING (host)
  WHERE CASE WHEN h.he = 1 THEN a.x = 1 ELSE a.s = 1 END
),
rb_rules AS (
  SELECT gr.host, (gr.key = 'allow') AS is_allow, gr.val AS pattern
  FROM rb_grp gr JOIN rb_chosen c ON c.host = gr.host AND c.g = gr.g
  WHERE gr.key IN ('allow', 'disallow') AND gr.val <> ''
),
rb_rx AS (
  SELECT host, is_allow, pattern,
         '^' || replace(replace(
             CASE WHEN pattern LIKE '%$' THEN substr(pattern, 1, length(pattern) - 1)
                  ELSE pattern END,
             '.', '\\.'), '*', '.*')
             || CASE WHEN pattern LIKE '%$' THEN '\\z' ELSE '' END AS rxs
  FROM rb_rules
)"""


def sql_robots_decisions(pages_rel: str, host_expr: str = "host",
                         path_expr: str = "path",
                         id_expr: str = "doc_id") -> str:
    """Final SELECT folding rb_rx onto a pages relation (twin of
    :func:`robots_decisions_df`); append after :func:`sql_parse_robots`."""
    return f"""SELECT {id_expr},
       CAST(MAX(CASE WHEN r.rxs IS NOT NULL AND regexp_matches(p.{path_expr}, r.rxs)
                THEN 2 * length(r.pattern) + CASE WHEN r.is_allow THEN 1 ELSE 0 END
                ELSE -1 END) AS INT) AS best_score,
       (MAX(CASE WHEN r.rxs IS NOT NULL AND regexp_matches(p.{path_expr}, r.rxs)
            THEN 2 * length(r.pattern) + CASE WHEN r.is_allow THEN 1 ELSE 0 END
            ELSE -1 END) = -1
        OR MAX(CASE WHEN r.rxs IS NOT NULL AND regexp_matches(p.{path_expr}, r.rxs)
               THEN 2 * length(r.pattern) + CASE WHEN r.is_allow THEN 1 ELSE 0 END
               ELSE -1 END) % 2 = 1) AS allowed
FROM {pages_rel} p LEFT JOIN rb_rx r ON r.host = p.{host_expr}
GROUP BY {id_expr}"""
