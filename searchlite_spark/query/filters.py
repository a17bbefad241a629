"""Filter AST -> Spark Column predicates over the docs table.

Reference semantics (searchlite-core/src/api/types.rs:668-679,
src/index/fastfields.rs:475-512, src/query/filters.rs:13-180):

* KeywordEq   — case-insensitive equality (lower both sides);
* KeywordIn   — case-insensitive membership;
* I64Range /
  F64Range    — inclusive [min, max];
* And/Or/Not  — boolean combinators;
* Nested      — same-object semantics: sibling Nested filters on the
  same path inside one And must be satisfied by a single object.
  Spark's ``exists(arrayCol, obj -> ...)`` expresses this directly on
  the un-flattened ARRAY<STRUCT> column, replacing the reference's
  ``_nested_parent`` bookkeeping.
* multi-valued scalars (ARRAY columns): match if any value passes.

JSON wire shape is the reference's externally-tagged enum:
``{"KeywordEq": {"field": "lang", "value": "en"}}``, ``{"And": [...]}``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def _is_array(df: DataFrame, col: str) -> bool:
    try:
        return isinstance(df.schema[col].dataType, T.ArrayType)
    except KeyError:
        return False


def _keyword_eq(df: DataFrame, fld: str, value: str) -> Column:
    target = F.lit(value.lower())
    if _is_array(df, fld):
        return F.exists(F.col(fld), lambda v: F.lower(v) == target)
    return F.lower(F.col(fld)) == target


def _keyword_in(df: DataFrame, fld: str, values: list[str]) -> Column:
    targets = [v.lower() for v in values]
    if _is_array(df, fld):
        arr = F.array(*[F.lit(t) for t in targets])
        return F.exists(F.col(fld), lambda v: F.array_contains(arr, F.lower(v)))
    return F.lower(F.col(fld)).isin(targets)


def _range(df: DataFrame, fld: str, mn, mx) -> Column:
    if _is_array(df, fld):
        return F.exists(
            F.col(fld), lambda v: (v >= F.lit(mn)) & (v <= F.lit(mx))
        )
    c = F.col(fld)
    return (c >= F.lit(mn)) & (c <= F.lit(mx))


def _nested_group(df: DataFrame, path: str, filters: list[dict]) -> Column:
    """All `filters` (each relative to one object of array `path`) must
    hold within a single object (query/filters.rs:52-82)."""

    def obj_pred(obj) -> Column:
        cond = F.lit(True)
        for f in filters:
            cond = cond & _compile_obj(obj, f)
        return cond

    return F.exists(F.col(path), obj_pred)


def _compile_obj(obj, node: dict) -> Column:
    (kind, body), = node.items()
    if kind == "KeywordEq":
        v = obj[body["field"]]
        return F.lower(v) == F.lit(body["value"].lower())
    if kind == "KeywordIn":
        targets = [x.lower() for x in body["values"]]
        return F.lower(obj[body["field"]]).isin(targets)
    if kind in ("I64Range", "F64Range"):
        v = obj[body["field"]]
        return (v >= F.lit(body["min"])) & (v <= F.lit(body["max"]))
    if kind == "And":
        cond = F.lit(True)
        for f in body:
            cond = cond & _compile_obj(obj, f)
        return cond
    if kind == "Or":
        cond = F.lit(False)
        for f in body:
            cond = cond | _compile_obj(obj, f)
        return cond
    if kind == "Not":
        return ~_compile_obj(obj, body)
    raise ValueError(f"unsupported nested filter `{kind}`")


def compile_filter(df: DataFrame, node: dict) -> Column:
    (kind, body), = node.items()
    if kind == "KeywordEq":
        return _keyword_eq(df, body["field"], body["value"])
    if kind == "KeywordIn":
        return _keyword_in(df, body["field"], body["values"])
    if kind in ("I64Range", "F64Range"):
        return _range(df, body["field"], body["min"], body["max"])
    if kind == "And":
        # group sibling Nested filters by path: same-object semantics
        nested_by_path: dict[str, list[dict]] = {}
        cond = F.lit(True)
        for f in body:
            (k, b), = f.items()
            if k == "Nested":
                nested_by_path.setdefault(b["path"], []).append(b["filter"])
            else:
                cond = cond & compile_filter(df, f)
        for path, subs in nested_by_path.items():
            cond = cond & _nested_group(df, path, subs)
        return cond
    if kind == "Or":
        cond = F.lit(False)
        for f in body:
            cond = cond | compile_filter(df, f)
        return cond
    if kind == "Not":
        return ~compile_filter(df, body)
    if kind == "Nested":
        return _nested_group(df, body["path"], [body["filter"]])
    raise ValueError(f"unsupported filter `{kind}`")


def compile_filters(df: DataFrame, nodes: list[dict]) -> Column:
    """An implicit And over a filter list (request root / bool.filter)."""
    if not nodes:
        return F.lit(True)
    return compile_filter(df, {"And": list(nodes)})
