"""script_score mini-language -> Spark Column.

Grammar parity with the reference (searchlite-core/src/query/script.rs):
numbers, identifiers (`_score`, param names, numeric field names),
`+ - * /`, unary minus, parens; 512 chars / 128 tokens max.
Div-by-zero or a non-finite result drops the hit (reader returns None)
— mapped to SQL NULL here; the executor filters NULL scores.
Missing field values evaluate as 0.0 (script.rs PushField).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

MAX_SCRIPT_LENGTH = 512
MAX_SCRIPT_TOKENS = 128

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op>[-+*/()]))"
)


class ScriptError(ValueError):
    pass


def tokenize(script: str) -> list[tuple[str, str]]:
    if not script.strip():
        raise ScriptError("script_score script cannot be empty")
    if len(script) > MAX_SCRIPT_LENGTH:
        raise ScriptError("script_score script too long")
    out = []
    pos = 0
    while pos < len(script):
        m = _TOKEN_RE.match(script, pos)
        if not m or m.end() == pos:
            rest = script[pos:].strip()
            if not rest:
                break
            raise ScriptError(f"unsupported character `{rest[0]}` in script_score")
        if m.group("num"):
            out.append(("num", m.group("num")))
        elif m.group("ident"):
            out.append(("ident", m.group("ident")))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    if len(out) > MAX_SCRIPT_TOKENS:
        raise ScriptError("script_score script is too large")
    return out


def script_identifiers(script: str) -> set[str]:
    return {v for t, v in tokenize(script) if t == "ident"}


_PREC = {"u-": 3, "*": 2, "/": 2, "+": 1, "-": 1}


def _to_rpn(tokens: list[tuple[str, str]]) -> list[tuple[str, str]]:
    output: list[tuple[str, str]] = []
    ops: list[str] = []
    prev: tuple[str, str] | None = None
    for t, v in tokens:
        if t in ("num", "ident"):
            output.append((t, v))
        elif v == "(":
            ops.append(v)
        elif v == ")":
            while ops and ops[-1] != "(":
                output.append(("op", ops.pop()))
            if not ops:
                raise ScriptError("mismatched parentheses in script_score")
            ops.pop()
        else:  # operator
            op = v
            if op == "-" and (
                prev is None or (prev[0] == "op" and prev[1] != ")")
            ):
                op = "u-"
            while (
                ops
                and ops[-1] != "("
                and (
                    _PREC[ops[-1]] > _PREC[op]
                    or (_PREC[ops[-1]] == _PREC[op] and op != "u-")
                )
            ):
                output.append(("op", ops.pop()))
            ops.append(op)
        prev = (t, v)
    while ops:
        if ops[-1] == "(":
            raise ScriptError("mismatched parentheses in script_score")
        output.append(("op", ops.pop()))
    return output


def compile_script(
    script: str,
    score_col: Column,
    params: dict[str, float] | None,
    field_col,  # callable: name -> Column (missing value handled by caller)
) -> Column:
    """Build the expression Column; div-by-0 / non-finite => NULL."""
    params = params or {}
    rpn = _to_rpn(tokenize(script))
    stack: list[Column] = []
    for t, v in rpn:
        if t == "num":
            stack.append(F.lit(float(v)))
        elif t == "ident":
            if v == "_score":
                stack.append(score_col.cast("double"))
            elif v in params:
                p = float(params[v])
                if p != p or p in (float("inf"), float("-inf")):
                    raise ScriptError(f"script_score param `{v}` must be finite")
                stack.append(F.lit(p))
            else:
                stack.append(
                    F.coalesce(field_col(v).cast("double"), F.lit(0.0))
                )
        elif v == "u-":
            if not stack:
                raise ScriptError("invalid script_score expression")
            stack.append(-stack.pop())
        else:
            if len(stack) < 2:
                raise ScriptError("invalid script_score expression")
            b = stack.pop()
            a = stack.pop()
            if v == "+":
                stack.append(a + b)
            elif v == "-":
                stack.append(a - b)
            elif v == "*":
                stack.append(a * b)
            else:  # division: 0 divisor drops the hit
                stack.append(F.when(b == 0.0, F.lit(None)).otherwise(a / b))
    if len(stack) != 1:
        raise ScriptError("invalid script_score expression")
    result = stack[0]
    # non-finite => drop (NULL)
    return F.when(
        F.isnan(result) | (F.abs(result) == float("inf")), F.lit(None)
    ).otherwise(result)
