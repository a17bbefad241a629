"""Query plan IR.

Mirrors the reference's ``QueryPlan { matcher, term_groups,
phrase_specs, scorer }`` (searchlite-core/src/query/planner.rs:206-243)
in set-oriented form: term groups and phrases get integer ids; the
executor computes, per candidate doc, the set of matched group ids and
phrase ids, and the matcher tree is evaluated as a Spark Column
expression over those sets.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class QualifiedTerm:
    """One expanded (field, token) scoring participant.

    key = "field:token"; weight = node boost x field boost (x 1/(1+dist)
    for fuzzy); leaf = scoring-leaf index (reader.rs:1020-1099)."""

    key: str
    field: str
    weight: float
    leaf: int


@dataclass
class TermGroupSpec:
    group_id: int
    keys: list[str]  # match keys (dedup'd)


@dataclass
class PhraseSpec:
    phrase_id: int
    # per-field alternatives: field -> list of position-bucketed token
    # lists (one tokens-list per source position; synonyms make >1 token
    # per bucket)
    field_tokens: dict[str, list[list[str]]]
    slop: int = 0


# ---- matcher tree ----------------------------------------------------------


@dataclass
class MatchAll:
    pass


@dataclass
class TermGroupRef:
    group_id: int


@dataclass
class PhraseRef:
    phrase_id: int


@dataclass
class QueryStringMatcher:
    term_groups: list[int]
    phrase_groups: list[int]
    not_term_groups: list[int]
    minimum_should_match: int | None = None


@dataclass
class BoolMatcher:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    filter: list = field(default_factory=list)  # Filter AST dicts
    minimum_should_match: int | None = None


@dataclass
class DisMaxMatcher:
    children: list = field(default_factory=list)


@dataclass
class NothingMatcher:
    """Matches no documents (e.g. a term that expands to zero keys)."""


# ---- score expression tree -------------------------------------------------


@dataclass(frozen=True)
class ScoreLeaf:
    leaf: int


@dataclass(frozen=True)
class ScoreSum:
    children: tuple


@dataclass(frozen=True)
class ScoreDisMax:
    children: tuple
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class ScoreConst:
    """constant_score: fixed value when the child matcher matches."""

    value: float


# ---- score NODE tree (the custom-score hook, reader.rs:418-613) ------------
# Distinct from the leaf ScoreExpr tree: nodes may gate on sub-matchers
# and read numeric doc columns (function_score / rank_feature /
# script_score).  "None" (drop hit) maps to SQL NULL.


@dataclass
class SNEmpty:
    pass


@dataclass
class SNExpr:
    expr: object  # ScoreLeaf | ScoreSum | ScoreDisMax


@dataclass
class SNSum:
    children: list


@dataclass
class SNDisMax:
    children: list
    tie_breaker: float = 0.0


@dataclass
class SNConstant:
    score: float
    matcher: object


@dataclass
class SNFunctionScore:
    matcher: object
    base: object
    functions: list  # FunctionSpec dicts
    score_mode: str  # sum|multiply|max|min|avg
    boost_mode: str  # multiply|sum|replace|max|min
    max_boost: float | None
    min_score: float | None
    boost: float


@dataclass
class SNRankFeature:
    matcher: object
    field: str
    modifier: str  # none|log|log1p|sqrt|reciprocal
    missing: float
    boost: float


@dataclass
class SNScriptScore:
    matcher: object
    base: object
    script: str
    params: dict
    boost: float


def needs_score_hook(node) -> bool:
    if isinstance(node, (SNConstant, SNFunctionScore, SNRankFeature, SNScriptScore)):
        return True
    if isinstance(node, (SNSum, SNDisMax)):
        return any(needs_score_hook(c) for c in node.children)
    return False


def score_node_fields(node) -> set[str]:
    """Numeric doc columns the score tree reads."""
    out: set[str] = set()
    if isinstance(node, SNFunctionScore):
        for f in node.functions:
            if f.get("type") in ("field_value_factor", "decay") and "field" in f:
                out.add(f["field"])
        out |= score_node_fields(node.base)
    elif isinstance(node, SNRankFeature):
        out.add(node.field)
    elif isinstance(node, SNScriptScore):
        from searchlite_spark.query.script import script_identifiers

        out |= {
            i for i in script_identifiers(node.script)
            if i != "_score" and not i.startswith("params.")
        }
        out |= score_node_fields(node.base)
    elif isinstance(node, (SNSum, SNDisMax)):
        for c in node.children:
            out |= score_node_fields(c)
    return out


def score_leaves(expr) -> set[int]:
    if expr is None:
        return set()
    if isinstance(expr, ScoreLeaf):
        return {expr.leaf}
    if isinstance(expr, (ScoreSum, ScoreDisMax)):
        out: set[int] = set()
        for c in expr.children:
            out |= score_leaves(c)
        return out
    return set()


def is_pure_sum(expr) -> bool:
    """True when the score tree is a flat sum of leaves — the fast path
    where per-doc score = one SUM aggregate with no leaf pivot."""
    if expr is None:
        return True
    if isinstance(expr, ScoreLeaf):
        return True
    if isinstance(expr, ScoreSum):
        return all(isinstance(c, ScoreLeaf) for c in expr.children)
    return False


@dataclass
class QueryPlan:
    matcher: object
    term_groups: list[TermGroupSpec]
    phrase_specs: list[PhraseSpec]
    qualified_terms: list[QualifiedTerm]
    score_expr: object  # ScoreLeaf | ScoreSum | ScoreDisMax | None
    root_filter: list  # Filter AST dicts (request-level `filter`)
    score_node: object = None  # SN* tree (custom-score hook)
