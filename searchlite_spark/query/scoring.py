"""Score-node tree evaluation -> Spark Column (the custom-score hook).

Reference semantics: reader.rs:418-613 ``evaluate_compiled_score`` and
query/score_functions.rs.  A node may return None ("drop this hit") —
mapped to SQL NULL; the executor filters NULL final scores.

Evaluated per matched doc AFTER the leaf aggregation, as pure column
expressions over the leaf-score map + numeric doc columns — Catalyst
codegens the whole tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from searchlite_spark.query import plan as P
from searchlite_spark.query.filters import compile_filters
from searchlite_spark.query.matching import matcher_col

F32_EPSILON = 1.1920929e-07
INF = float("inf")


def _leaf_expr_col(expr, leaf_map: Column | None, pure_sum_score: Column | None) -> Column:
    """ScoreExpr (leaf algebra) evaluation."""
    if expr is None:
        return F.lit(0.0)
    if pure_sum_score is not None and P.is_pure_sum(expr):
        return F.coalesce(pure_sum_score, F.lit(0.0))
    if isinstance(expr, P.ScoreLeaf):
        return F.coalesce(leaf_map.getItem(expr.leaf), F.lit(0.0))
    if isinstance(expr, P.ScoreSum):
        return sum(
            (_leaf_expr_col(c, leaf_map, None) for c in expr.children), F.lit(0.0)
        )
    if isinstance(expr, P.ScoreDisMax):
        children = [_leaf_expr_col(c, leaf_map, None) for c in expr.children]
        if len(children) == 1:
            return children[0]
        mx = F.greatest(*children)
        total = sum(children, F.lit(0.0))
        return mx + F.lit(expr.tie_breaker) * (total - mx)
    raise ValueError(f"unknown score expr {type(expr)}")


def _finite_or_null(c: Column) -> Column:
    return F.when(F.isnan(c) | (F.abs(c) == INF), F.lit(None)).otherwise(c)


def _apply_fv_modifier(v: Column, modifier: str) -> Column:
    if modifier == "none":
        return v
    if modifier == "log":
        return F.when(v <= 0.0, F.lit(0.0)).otherwise(F.log(v))
    if modifier == "log1p":
        return F.when(v <= -1.0, F.lit(0.0)).otherwise(F.log1p(v))
    if modifier == "log2p":
        return F.when(v <= -1.0, F.lit(0.0)).otherwise(F.log2(v + 1.0))
    if modifier == "sqrt":
        return F.when(v < 0.0, F.lit(0.0)).otherwise(F.sqrt(v))
    if modifier == "reciprocal":
        return F.when(v == 0.0, F.lit(0.0)).otherwise(1.0 / v)
    raise ValueError(f"unknown field_value_factor modifier `{modifier}`")


def _function_col(spec: dict, df: DataFrame) -> Column:
    """One FunctionSpec (tag="type", api/types.rs:186-219) -> nullable
    Column (NULL = function inactive)."""
    kind = spec["type"]
    body = spec
    filt = body.get("filter")
    gate = compile_filters(df, [filt]) if filt else F.lit(True)
    if kind == "weight":
        w = float(body["weight"])
        if w != w or abs(w) == INF:
            raise ValueError("weight must be finite")
        return F.when(gate, F.lit(w)).otherwise(F.lit(None))
    if kind == "field_value_factor":
        field = body["field"]
        factor = float(body.get("factor", 1.0))
        missing = float(body.get("missing") if body.get("missing") is not None else 0.0)
        modifier = (body.get("modifier") or "none").lower()
        raw = F.coalesce(F.col(field).cast("double"), F.lit(missing))
        scaled = raw * F.lit(factor)
        modified = _finite_or_null(_apply_fv_modifier(_finite_or_null(scaled), modifier))
        return F.when(gate, modified).otherwise(F.lit(None))
    if kind == "decay":
        field = body["field"]
        origin = float(body["origin"])
        scale = float(body["scale"])
        if scale <= 0:
            raise ValueError("decay scale must be > 0")
        offset = float(body.get("offset", 0.0))
        decay = float(body.get("decay", 0.5))
        if not (0.0 < decay <= 1.0):
            raise ValueError("decay factor must be in (0, 1]")
        fn = (body.get("function") or "exp").lower()
        v = F.col(field).cast("double")  # missing -> NULL -> inactive
        dist = F.abs(v - F.lit(origin)) - F.lit(offset)
        norm = F.greatest(dist, F.lit(0.0)) / F.lit(scale)
        if fn == "exp":
            val = F.pow(F.lit(decay), norm)
        elif fn == "gauss":
            val = F.pow(F.lit(decay), norm * norm)
        elif fn == "linear":
            val = F.greatest(
                (1.0 - norm) * F.lit(1.0 - decay) + F.lit(decay), F.lit(0.0)
            )
        else:
            raise ValueError(f"unknown decay function `{fn}`")
        return F.when(gate & v.isNotNull(), _finite_or_null(val)).otherwise(
            F.lit(None)
        )
    raise ValueError(f"unknown function_score function `{kind}`")


def _apply_rank_modifier(v: Column, modifier: str) -> Column:
    if modifier == "none":
        return v
    if modifier == "log":
        return F.when(v <= 0.0, F.lit(0.0)).otherwise(F.log(v))
    if modifier == "log1p":
        return F.when(v <= -1.0, F.lit(0.0)).otherwise(F.log1p(v))
    if modifier == "sqrt":
        return F.when(v < 0.0, F.lit(0.0)).otherwise(F.sqrt(v))
    if modifier == "reciprocal":
        return F.when(v == 0.0, F.lit(0.0)).otherwise(1.0 / v)
    raise ValueError(f"unknown rank_feature modifier `{modifier}`")


def score_node_col(
    node,
    df: DataFrame,
    leaf_map: Column | None,
    pure_sum_score: Column | None,
) -> Column:
    """Evaluate the score tree; NULL result = drop hit."""
    if isinstance(node, P.SNEmpty):
        return F.lit(1.0)
    if isinstance(node, P.SNExpr):
        return _leaf_expr_col(node.expr, leaf_map, pure_sum_score)
    if isinstance(node, (P.SNSum, P.SNDisMax)):
        children = [
            score_node_col(c, df, leaf_map, pure_sum_score) for c in node.children
        ]
        if not children:
            return F.lit(0.0) if isinstance(node, P.SNDisMax) else F.lit(0.0)
        any_some = F.lit(False)
        for c in children:
            any_some = any_some | c.isNotNull()
        if isinstance(node, P.SNSum):
            total = sum((F.coalesce(c, F.lit(0.0)) for c in children), F.lit(0.0))
            return F.when(any_some, total).otherwise(F.lit(None))
        mx = F.greatest(*children) if len(children) > 1 else children[0]
        total = sum((F.coalesce(c, F.lit(0.0)) for c in children), F.lit(0.0))
        val = mx + F.lit(node.tie_breaker) * (total - mx)
        return F.when(any_some, val).otherwise(F.lit(None))
    if isinstance(node, P.SNConstant):
        return F.when(
            matcher_col(node.matcher, df), F.lit(node.score)
        ).otherwise(F.lit(0.0))
    if isinstance(node, P.SNFunctionScore):
        match = matcher_col(node.matcher, df)
        base = score_node_col(node.base, df, leaf_map, pure_sum_score)
        fcols = [_function_col(s, df) for s in node.functions]
        if fcols:
            n_active = sum((c.isNotNull().cast("int") for c in fcols), F.lit(0))
            base_eff = F.when(
                (F.abs(base) <= F32_EPSILON) & (n_active > 0), F.lit(1.0)
            ).otherwise(base)
            mode = node.score_mode
            if mode == "sum":
                fs = sum((F.coalesce(c, F.lit(0.0)) for c in fcols), F.lit(0.0))
            elif mode == "multiply":
                fs = F.lit(1.0)
                for c in fcols:
                    fs = fs * F.coalesce(c, F.lit(1.0))
            elif mode == "max":
                fs = F.greatest(*fcols) if len(fcols) > 1 else fcols[0]
            elif mode == "min":
                fs = F.least(*fcols) if len(fcols) > 1 else fcols[0]
            elif mode == "avg":
                fs = sum(
                    (F.coalesce(c, F.lit(0.0)) for c in fcols), F.lit(0.0)
                ) / n_active
            else:
                raise ValueError(f"unknown score_mode `{mode}`")
            bm = node.boost_mode
            if bm == "multiply":
                combined = base_eff * fs
            elif bm == "sum":
                combined = base_eff + fs
            elif bm == "replace":
                combined = fs
            elif bm == "max":
                combined = F.greatest(base_eff, fs)
            elif bm == "min":
                combined = F.least(base_eff, fs)
            else:
                raise ValueError(f"unknown boost_mode `{bm}`")
            combined = F.when(n_active > 0, combined).otherwise(base)
        else:
            combined = base
        if node.max_boost is not None:
            combined = F.least(combined, F.lit(float(node.max_boost)))
        if node.min_score is not None:
            combined = F.when(
                combined < F.lit(float(node.min_score)), F.lit(None)
            ).otherwise(combined)
        combined = combined * F.lit(node.boost)
        # base None propagates; non-match => 0.0
        out = F.when(~match, F.lit(0.0)).otherwise(
            F.when(base.isNull(), F.lit(None)).otherwise(combined)
        )
        return out
    if isinstance(node, P.SNRankFeature):
        match = matcher_col(node.matcher, df)
        raw = F.coalesce(F.col(node.field).cast("double"), F.lit(float(node.missing)))
        val = _finite_or_null(_apply_rank_modifier(raw, node.modifier)) * F.lit(
            node.boost
        )
        return F.when(~match, F.lit(0.0)).otherwise(_finite_or_null(val))
    if isinstance(node, P.SNScriptScore):
        from searchlite_spark.query.script import compile_script

        match = matcher_col(node.matcher, df)
        base = score_node_col(node.base, df, leaf_map, pure_sum_score)
        script_val = compile_script(
            node.script, base, node.params, lambda name: F.col(name)
        )
        val = script_val * F.lit(node.boost)
        return F.when(~match, F.lit(0.0)).otherwise(
            F.when(base.isNull(), F.lit(None)).otherwise(_finite_or_null(val))
        )
    raise ValueError(f"unknown score node {type(node)}")
