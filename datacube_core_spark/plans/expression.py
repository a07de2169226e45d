"""CLI search-expression grammar (reference ``datacube/ui/expression.py``).

The reference parses ``FIELD = value``, ``FIELD in [lo, hi]``,
``time in 2014-03``, ``time in [2014-01, 2014-06]``, ``time > DATE``,
``time < DATE`` with a lark grammar; lark is not available here, so the
same little language is parsed with a regex tokenizer — the produced
search dict (field → value | Range) and time semantics
(``time_to_search_dims`` with Period-end snapping) match.
"""

from __future__ import annotations

import re
from typing import Any, Dict

from .query import Range, time_to_search_dims

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<field>[a-zA-Z][\w\d_]*)\s*(?P<op>=|in|>|<)\s*
        (?:
            \[\s*(?P<lo>[^,\]]+?)\s*,\s*(?P<hi>[^,\]]+?)\s*\]
          | "(?P<qstr>[^"]*)"
          | (?P<bare>[^\s]+)
        )
    )""",
    re.VERBOSE,
)

_DATE = re.compile(r"^\d{4}(-\d{1,2}(-\d{1,2})?)?$")
_NUM = re.compile(r"^[+-]?\d+(\.\d+)?$")


def _coerce(text: str) -> Any:
    if _NUM.match(text):
        f = float(text)
        return int(f) if f.is_integer() and "." not in text else f
    return text


def parse_expressions(*expression_text: str) -> Dict[str, Any]:
    """Parse CLI search expressions into {field: value | Range}."""
    src = " ".join(expression_text)
    out: Dict[str, Any] = {}
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"cannot parse search expression at: {src[pos:]!r}")
        pos = m.end()
        field, op = m.group("field"), m.group("op")
        if field == "time":
            if op == "in":
                if m.group("lo") is not None:
                    out["time"] = time_to_search_dims((m.group("lo"), m.group("hi")))
                else:
                    out["time"] = time_to_search_dims(m.group("bare") or m.group("qstr"))
            elif op == ">":
                out["time"] = time_to_search_dims((m.group("bare"), None))
            elif op == "<":
                out["time"] = time_to_search_dims((None, m.group("bare")))
            else:  # '=' treated as 'in' single date
                out["time"] = time_to_search_dims(m.group("bare") or m.group("qstr"))
            continue
        if op == "in":
            if m.group("lo") is None:
                raise ValueError(f"field {field!r}: 'in' requires [lo, hi]")
            out[field] = Range(_coerce(m.group("lo")), _coerce(m.group("hi")))
        elif op == "=":
            val = m.group("qstr") if m.group("qstr") is not None else m.group("bare")
            out[field] = _coerce(val)
        else:
            raise ValueError(f"field {field!r}: operator {op!r} only valid for time")
    return out
