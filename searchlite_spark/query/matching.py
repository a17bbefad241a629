"""Matcher-tree evaluation as Spark Column predicates.

Per-doc evaluation over the sets of matched term-group ids
(``_groups`` ARRAY<INT>) and phrase ids (``_phrases`` ARRAY<INT>),
mirroring the reference's QueryEvaluator (reader.rs:1481-1598).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from searchlite_spark.query import plan as P
from searchlite_spark.query.filters import compile_filters


def _has_group(gid: int) -> Column:
    return F.array_contains(F.col("_groups"), gid)


def _has_phrase(pid: int) -> Column:
    return F.array_contains(F.col("_phrases"), pid)


def matcher_col(node, docs_df: DataFrame) -> Column:
    if isinstance(node, P.MatchAll):
        return F.lit(True)
    if isinstance(node, P.NothingMatcher):
        return F.lit(False)
    if isinstance(node, P.TermGroupRef):
        return _has_group(node.group_id)
    if isinstance(node, P.PhraseRef):
        return _has_phrase(node.phrase_id)
    if isinstance(node, P.QueryStringMatcher):
        if not node.term_groups and not node.phrase_groups and not node.not_term_groups:
            return F.lit(False)
        cond = F.lit(True)
        for gid in node.not_term_groups:
            cond = cond & ~_has_group(gid)
        for pid in node.phrase_groups:
            cond = cond & _has_phrase(pid)
        if not node.term_groups:
            if node.phrase_groups or node.not_term_groups:
                return cond
            return F.lit(False)
        matched = sum(
            (_has_group(g).cast("int") for g in node.term_groups), F.lit(0)
        )
        required = (
            node.minimum_should_match if node.minimum_should_match is not None else 1
        )
        return cond & (matched >= F.lit(required))
    if isinstance(node, P.DisMaxMatcher):
        if not node.children:
            return F.lit(False)
        cond = F.lit(False)
        for c in node.children:
            cond = cond | matcher_col(c, docs_df)
        return cond
    if isinstance(node, P.BoolMatcher):
        cond = F.lit(True)
        for c in node.must:
            cond = cond & matcher_col(c, docs_df)
        for c in node.must_not:
            cond = cond & ~matcher_col(c, docs_df)
        if node.filter:
            cond = cond & compile_filters(docs_df, node.filter)
        if node.should:
            msm = node.minimum_should_match
            if msm is None:
                msm = 1 if (not node.must and not node.filter) else 0
            if msm > 0:
                should_matched = sum(
                    (matcher_col(c, docs_df).cast("int") for c in node.should),
                    F.lit(0),
                )
                cond = cond & (should_matched >= F.lit(msm))
        return cond
    raise ValueError(f"unknown matcher {type(node)}")


def may_match_empty(node) -> bool:
    """Whether a doc with no query-term/phrase hits can still match —
    decides candidate-only vs full-scan execution."""
    if isinstance(node, P.MatchAll):
        return True
    if isinstance(node, (P.TermGroupRef, P.PhraseRef, P.NothingMatcher)):
        return False
    if isinstance(node, P.QueryStringMatcher):
        if not node.term_groups and not node.phrase_groups and not node.not_term_groups:
            return False
        if node.phrase_groups:
            return False
        if not node.term_groups:
            return True  # pure negation
        required = (
            node.minimum_should_match if node.minimum_should_match is not None else 1
        )
        return required <= 0
    if isinstance(node, P.DisMaxMatcher):
        return any(may_match_empty(c) for c in node.children)
    if isinstance(node, P.BoolMatcher):
        for c in node.must:
            if not may_match_empty(c):
                return False
        msm = node.minimum_should_match
        if msm is None:
            msm = 1 if (not node.must and not node.filter and node.should) else 0
        if msm > 0:
            matched = sum(1 for c in node.should if may_match_empty(c))
            if matched < msm:
                return False
        if not node.must and not node.should and not node.filter and not node.must_not:
            return False
        return True
    return True


def matcher_score_fields(node) -> set[str]:
    """Doc columns referenced by bool filters inside the matcher tree."""
    cols: set[str] = set()

    def from_filter(f: dict):
        (kind, body), = f.items()
        if kind in ("KeywordEq", "KeywordIn", "I64Range", "F64Range"):
            cols.add(body["field"])
        elif kind in ("And", "Or"):
            for x in body:
                from_filter(x)
        elif kind == "Not":
            from_filter(body)
        elif kind == "Nested":
            cols.add(body["path"])

    def walk(m):
        if isinstance(m, P.BoolMatcher):
            for f in m.filter:
                from_filter(f)
            for c in m.must + m.should + m.must_not:
                walk(c)
        elif isinstance(m, P.DisMaxMatcher):
            for c in m.children:
                walk(c)

    walk(node)
    return cols
