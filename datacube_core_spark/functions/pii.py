"""PII detection + redaction (training-data scrubbing ops).

Web-corpus pipelines scrub emails / phone numbers / IP addresses before
training.  All detection and redaction is Catalyst ``regexp_count`` /
``regexp_replace`` (JVM codegen, no Python); patterns avoid constructs
where Java regex and DuckDB's RE2 disagree (no lookahead, no backrefs),
and every function has a DuckDB twin (entry ``pii_scrub``; DuckDB's
``regexp_replace`` needs the ``'g'`` flag to match Spark's replace-all).

Redaction order is email → IP → phone in BOTH engines — order matters
(emails contain digit runs the phone pattern could chew on, and an IPv4
address IS a match for the permissive phone pattern), so the order is
part of the contract.  ``phone_count_col`` counts raw pattern hits —
on unscrubbed text an IP therefore also counts as a phone; scrub-then-
count when exclusive counts are needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def email_count_col(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_RE))


def phone_count_col(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_RE))


def ip_count_col(text: Column) -> Column:
    return F.regexp_count(text, F.lit(IPV4_RE))


def scrub_pii_col(text: Column) -> Column:
    """Redact email → IP → phone (fixed order, see module docstring)."""
    t = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    t = F.regexp_replace(t, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(t, PHONE_RE, PHONE_TOKEN)


# --- DuckDB twins ----------------------------------------------------------

def _sql_quote(pat: str) -> str:
    # DuckDB string literals are SQL-standard: no backslash processing,
    # only quote doubling
    return "'" + pat.replace("'", "''") + "'"


def sql_email_count(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, {_sql_quote(EMAIL_RE)}))"


def sql_phone_count(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, {_sql_quote(PHONE_RE)}))"


def sql_ip_count(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, {_sql_quote(IPV4_RE)}))"


def sql_scrub_pii(col: str = "text") -> str:
    t = f"regexp_replace({col}, {_sql_quote(EMAIL_RE)}, '{EMAIL_TOKEN}', 'g')"
    t = f"regexp_replace({t}, {_sql_quote(IPV4_RE)}, '{IP_TOKEN}', 'g')"
    return f"regexp_replace({t}, {_sql_quote(PHONE_RE)}, '{PHONE_TOKEN}', 'g')"
