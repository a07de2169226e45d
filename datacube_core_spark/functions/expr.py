"""Band-arithmetic formula compiler: string DSL → Catalyst Columns.

The reference parses user formulas with a lark grammar
(``datacube/virtual/expr.py:11-106``) and runs three interpreters over the
tree: data evaluation, dtype inference, and nodata-mask propagation
(mask = OR of operand masks, ``expr.py:84-135``).  Here the same operator
surface — ``| & ^ ~ == != <= >= < > << >> + - * / // % ** neg pos`` —
is parsed with Python's ``ast`` (a strict whitelist; no call/attribute/
subscript nodes) and compiled straight to Column expressions, so the
formula executes inside whole-stage codegen.

* :func:`compile_formula` — formula + name→Column env → value Column
* :func:`compile_nodata_mask` — the invalid-mask dual: OR of the invalid
  masks of every referenced band (reference MaskEvaluator semantics)
* :func:`formula_with_nodata` — value where all operands valid, else nodata
"""

from __future__ import annotations

import ast
import operator
from typing import Callable, Dict, Mapping, Optional, Set

from pyspark.sql import Column
from pyspark.sql import functions as F

_BINOPS: Dict[type, Callable] = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.Mod: operator.mod,
    ast.Pow: lambda a, b: a ** b,
    ast.BitOr: lambda a, b: a.bitwiseOR(b) if isinstance(a, Column) else a | b,
    ast.BitAnd: lambda a, b: a.bitwiseAND(b) if isinstance(a, Column) else a & b,
    ast.BitXor: lambda a, b: a.bitwiseXOR(b) if isinstance(a, Column) else a ^ b,
    ast.FloorDiv: lambda a, b: F.floor(a / b).cast("long"),
}

# shift amounts must be plain ints (Spark's shiftleft/shiftright signature)
_SHIFTS = {ast.LShift: F.shiftleft, ast.RShift: F.shiftright}

_CMPOPS: Dict[type, Callable] = {
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
}


def parse_names(formula: str) -> Set[str]:
    """Band names referenced by a formula."""
    tree = ast.parse(formula, mode="eval")
    return {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}


def _compile(node, env: Mapping[str, Column]):
    if isinstance(node, ast.Expression):
        return _compile(node.body, env)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)):
            return F.lit(node.value)
        raise ValueError(f"unsupported literal {node.value!r}")
    if isinstance(node, ast.Name):
        if node.id not in env:
            raise KeyError(f"unknown band {node.id!r}")
        return env[node.id]
    if isinstance(node, ast.BinOp):
        if type(node.op) in _SHIFTS:
            if not (isinstance(node.right, ast.Constant) and isinstance(node.right.value, int)):
                raise ValueError("shift amount must be an integer literal")
            return _SHIFTS[type(node.op)](_compile(node.left, env), node.right.value)
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise ValueError(f"unsupported operator {type(node.op).__name__}")
        return op(_compile(node.left, env), _compile(node.right, env))
    if isinstance(node, ast.UnaryOp):
        v = _compile(node.operand, env)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return v
        if isinstance(node.op, ast.Invert):
            return F.bitwise_not(v)
        raise ValueError(f"unsupported unary {type(node.op).__name__}")
    if isinstance(node, ast.Compare):
        if len(node.ops) != 1:
            raise ValueError("chained comparisons not supported")
        op = _CMPOPS.get(type(node.ops[0]))
        if op is None:
            raise ValueError(f"unsupported comparison {type(node.ops[0]).__name__}")
        return op(_compile(node.left, env), _compile(node.comparators[0], env))
    raise ValueError(f"unsupported syntax node {type(node).__name__}")


def compile_formula(formula: str, env: Mapping[str, Column]) -> Column:
    return _compile(ast.parse(formula, mode="eval"), env)


def compile_nodata_mask(
    formula: str,
    nodata: Mapping[str, Optional[float]],
    env: Mapping[str, Column],
) -> Column:
    """Invalid mask: OR of each referenced band's invalid mask (reference
    MaskEvaluator: the result is nodata wherever ANY operand is nodata)."""
    import math

    mask = F.lit(False)
    for name in sorted(parse_names(formula)):
        nd = nodata.get(name)
        if nd is None:
            continue
        col = env[name]
        if isinstance(nd, float) and math.isnan(nd):
            mask = mask | F.isnan(col)
        else:
            mask = mask | (col == F.lit(nd))
    return mask


def formula_with_nodata(
    formula: str,
    env: Mapping[str, Column],
    nodata: Mapping[str, Optional[float]],
    out_nodata: float,
) -> Column:
    value = compile_formula(formula, env)
    invalid = compile_nodata_mask(formula, nodata, env)
    return F.when(invalid, F.lit(out_nodata)).otherwise(value)
