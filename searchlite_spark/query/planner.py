"""Request -> QueryPlan compiler.

Follows the reference planner's recursive build
(searchlite-core/src/query/planner.rs:246-835): every query node
produces (matcher, score-expr); term groups hold the raw term plus its
target fields; expansion against the search analyzer / term dictionary
happens in ``expand.py`` (the reference does this in
reader.rs:1020-1099 ``expand_term_groups``).

Scoring composition rules (planner.rs):
* query_string      — one leaf per parsed term; root = Sum.
* multi_match       — best_fields: one leaf per field, DisMax(tie);
                      most_fields/cross_fields: one shared leaf (Sum).
* dis_max           — DisMax(children, tie).
* bool              — Sum of child scorers (must + should; must_not
                      children are built unscored).
* term/prefix/etc.  — one leaf.
* phrase/match_all/constant_score — no scorer (filter-only).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from searchlite_spark.index.schema import IndexSchema
from searchlite_spark.query.parser import parse_query
from searchlite_spark.query.plan import (
    BoolMatcher,
    SNConstant,
    SNDisMax,
    SNEmpty,
    SNExpr,
    SNFunctionScore,
    SNRankFeature,
    SNScriptScore,
    SNSum,
    DisMaxMatcher,
    MatchAll,
    PhraseRef,
    PhraseSpec,
    QueryPlan,
    QueryStringMatcher,
    ScoreDisMax,
    ScoreLeaf,
    ScoreSum,
    TermGroupRef,
)


@dataclass
class FieldSpecInternal:
    field: str
    boost: float = 1.0
    leaf: int | None = None


@dataclass
class RawTermGroup:
    """Pre-expansion term group (planner.rs TermGroupSpec)."""

    group_id: int
    fields: list[FieldSpecInternal]
    term: str
    expansion: tuple  # ("exact",) | ("prefix", max_exp) | ("wildcard", max_exp) | ("regex", max_exp) | ("fuzzy", opts)
    boost: float
    score: bool
    leaf: int | None


def _validate_boost(b) -> float:
    v = 1.0 if b is None else float(b)
    if not (v >= 0.0) or v != v or v == float("inf"):
        raise ValueError("query boost must be finite and non-negative (>= 0)")
    return v


def _validate_tie(t) -> float:
    v = 0.0 if t is None else float(t)
    if v < 0.0 or v > 1.0:
        raise ValueError("tie_breaker must be within [0, 1]")
    return v


def _parse_field_spec(spec) -> tuple[str, float]:
    """Accept "title", "title^2.0", or {"field":..., "boost":...}."""
    if isinstance(spec, str):
        if "^" in spec:
            name, _, b = spec.partition("^")
            return name, float(b)
        return spec, 1.0
    return spec["field"], _validate_boost(spec.get("boost"))


def _resolve_msm(msm, term_count: int, op: str) -> int | None:
    if term_count == 0:
        return None
    base = term_count if op == "and" else 1
    if msm is None:
        return base
    if isinstance(msm, str):
        if not msm.endswith("%"):
            raise ValueError("minimum_should_match percentage must end with %")
        pct = float(msm[:-1])
        if not 0.0 <= pct <= 100.0:
            raise ValueError("minimum_should_match percentage out of range")
        import math

        return min(math.ceil(pct / 100.0 * term_count), term_count)
    return min(int(msm), term_count)


class PlanBuilder:
    def __init__(self, default_fields: list[str]):
        self.default_fields = default_fields
        self.raw_groups: list[RawTermGroup] = []
        self.phrase_specs: list[tuple[list[str], list[str], int]] = []
        self.next_leaf = 0

    def alloc_leaf(self) -> int:
        idx = self.next_leaf
        self.next_leaf += 1
        return idx

    def push_group(self, fields, term, expansion, boost, score, leaf) -> int:
        gid = len(self.raw_groups)
        self.raw_groups.append(
            RawTermGroup(gid, fields, term, expansion, boost, score, leaf)
        )
        return gid

    def push_phrase(self, fields: list[str], terms: list[str], slop: int) -> int:
        idx = len(self.phrase_specs)
        self.phrase_specs.append((fields, terms, slop))
        return idx

    def _default_specs(self, leaf=None) -> list[FieldSpecInternal]:
        return [FieldSpecInternal(f, 1.0, leaf) for f in self.default_fields]

    # -- node builders --------------------------------------------------

    def build(self, node, score: bool, boost: float):
        if isinstance(node, str):  # string shorthand = query_string
            node = {"type": "query_string", "query": node}
        ntype = node.get("type")
        if ntype == "match_all":
            _validate_boost(node.get("boost"))
            return MatchAll(), None, SNEmpty()

        if ntype == "query_string":
            node_boost = _validate_boost(node.get("boost"))
            parsed = parse_query(node["query"])
            if node.get("fields"):
                base_fields = [
                    FieldSpecInternal(*_parse_field_spec(s))
                    for s in node["fields"]
                ]
            else:
                base_fields = self._default_specs()
            term_groups, leaves = [], []
            for t in parsed.terms:
                fields = (
                    [FieldSpecInternal(t.field, 1.0, None)]
                    if t.field
                    else list(base_fields)
                )
                leaf = self.alloc_leaf() if score else None
                gid = self.push_group(
                    fields, t.term, ("exact",), boost * node_boost, score, leaf
                )
                term_groups.append(gid)
                if leaf is not None:
                    leaves.append(ScoreLeaf(leaf))
            not_groups = []
            for t in parsed.not_terms:
                fields = (
                    [FieldSpecInternal(t.field, 1.0, None)]
                    if t.field
                    else list(base_fields)
                )
                gid = self.push_group(
                    fields, t.term, ("exact",), boost * node_boost, False, None
                )
                not_groups.append(gid)
            phrase_groups = []
            for p in parsed.phrases:
                flds = [p.field] if p.field else [f.field for f in base_fields]
                phrase_groups.append(self.push_phrase(flds, p.terms, 0))
            matcher = QueryStringMatcher(term_groups, phrase_groups, not_groups)
            scorer = (
                None
                if not leaves
                else leaves[0]
                if len(leaves) == 1
                else ScoreSum(tuple(leaves))
            )
            node_sn = SNExpr(scorer) if scorer is not None else SNEmpty()
            return matcher, scorer, node_sn

        if ntype == "multi_match":
            node_boost = _validate_boost(node.get("boost"))
            op = (node.get("operator") or "or").lower()
            parsed = parse_query(node["query"])
            required = _resolve_msm(
                node.get("minimum_should_match"), len(parsed.terms), op
            )
            tie = _validate_tie(node.get("tie_breaker"))
            match_type = node.get("match_type", "best_fields")
            specs_raw = [_parse_field_spec(s) for s in node["fields"]]
            if match_type == "best_fields":
                specs, leaves = [], []
                for name, fboost in specs_raw:
                    leaf = self.alloc_leaf()
                    leaves.append(ScoreLeaf(leaf))
                    specs.append(FieldSpecInternal(name, fboost, leaf))
                scorer = ScoreDisMax(tuple(leaves), tie) if leaves else None
                group_leaf = None
            elif match_type in ("most_fields", "cross_fields"):
                leaf = self.alloc_leaf() if score else None
                specs = [FieldSpecInternal(n, b, leaf) for n, b in specs_raw]
                scorer = ScoreLeaf(leaf) if leaf is not None else None
                group_leaf = leaf
            else:
                raise ValueError(f"unknown multi_match type `{match_type}`")
            term_groups = [
                self.push_group(
                    list(specs), t.term, ("exact",), boost * node_boost,
                    score, group_leaf,
                )
                for t in parsed.terms
            ]
            not_groups = [
                self.push_group(
                    list(specs), t.term, ("exact",), boost * node_boost,
                    False, None,
                )
                for t in parsed.not_terms
            ]
            phrase_groups = [
                self.push_phrase([s.field for s in specs], p.terms, 0)
                for p in parsed.phrases
            ]
            matcher = QueryStringMatcher(
                term_groups, phrase_groups, not_groups, required
            )
            node_sn = SNExpr(scorer) if scorer is not None else SNEmpty()
            return matcher, scorer, node_sn

        if ntype == "dis_max":
            node_boost = _validate_boost(node.get("boost"))
            tie = _validate_tie(node.get("tie_breaker"))
            matchers, scorers, score_nodes = [], [], []
            for child in node.get("queries", []):
                m, s, sn = self.build(child, score, boost * node_boost)
                matchers.append(m)
                if s is not None:
                    scorers.append(s)
                if not isinstance(sn, SNEmpty):
                    score_nodes.append(sn)
            scorer = (
                None
                if not scorers
                else scorers[0]
                if len(scorers) == 1
                else ScoreDisMax(tuple(scorers), tie)
            )
            if not score_nodes:
                node_sn = SNEmpty()
            elif len(score_nodes) == 1:
                node_sn = score_nodes[0]
            else:
                node_sn = SNDisMax(score_nodes, tie)
            return DisMaxMatcher(matchers), scorer, node_sn

        if ntype in ("term", "prefix", "wildcard", "regex"):
            node_boost = _validate_boost(node.get("boost"))
            leaf = self.alloc_leaf() if score else None
            if ntype == "term":
                expansion = ("exact",)
            else:
                default_cap = 50 if ntype == "prefix" else 100
                expansion = (ntype, int(node.get("max_expansions") or default_cap))
            gid = self.push_group(
                [FieldSpecInternal(node["field"], 1.0, None)],
                node["value"],
                expansion,
                boost * node_boost,
                score,
                leaf,
            )
            scorer = ScoreLeaf(leaf) if leaf is not None else None
            node_sn = SNExpr(scorer) if scorer is not None else SNEmpty()
            return TermGroupRef(gid), scorer, node_sn

        if ntype == "phrase":
            _validate_boost(node.get("boost"))
            fields = (
                [node["field"]] if node.get("field") else list(self.default_fields)
            )
            idx = self.push_phrase(fields, node["terms"], int(node.get("slop") or 0))
            return PhraseRef(idx), None, SNEmpty()

        if ntype == "bool":
            node_boost = _validate_boost(node.get("boost"))
            child_boost = boost * node_boost
            must, should, must_not, scorers, score_nodes = [], [], [], [], []
            for child in node.get("must", []):
                m, s, sn = self.build(child, score, child_boost)
                must.append(m)
                if s is not None:
                    scorers.append(s)
                if not isinstance(sn, SNEmpty):
                    score_nodes.append(sn)
            for child in node.get("should", []):
                m, s, sn = self.build(child, score, child_boost)
                should.append(m)
                if s is not None:
                    scorers.append(s)
                if not isinstance(sn, SNEmpty):
                    score_nodes.append(sn)
            for child in node.get("must_not", []):
                m, s, sn = self.build(child, False, child_boost)
                must_not.append(m)
                if s is not None:
                    scorers.append(s)
                if not isinstance(sn, SNEmpty):
                    score_nodes.append(sn)
            scorer = (
                None
                if not scorers
                else scorers[0]
                if len(scorers) == 1
                else ScoreSum(tuple(scorers))
            )
            if not score_nodes:
                node_sn = SNEmpty()
            elif len(score_nodes) == 1:
                node_sn = score_nodes[0]
            else:
                node_sn = SNSum(score_nodes)
            return (
                BoolMatcher(
                    must,
                    should,
                    must_not,
                    list(node.get("filter", [])),
                    node.get("minimum_should_match"),
                ),
                scorer,
                node_sn,
            )

        if ntype == "constant_score":
            node_boost = _validate_boost(node.get("boost"))
            matcher = BoolMatcher([], [], [], [node["filter"]], None)
            return matcher, None, SNConstant(boost * node_boost, matcher)

        if ntype == "function_score":
            node_boost = _validate_boost(node.get("boost"))
            max_boost = node.get("max_boost")
            min_score = node.get("min_score")
            matcher, scorer, base_sn = self.build(node["query"], score, boost)
            node_sn = SNFunctionScore(
                matcher=matcher,
                base=base_sn,
                functions=list(node.get("functions", [])),
                score_mode=(node.get("score_mode") or "sum").lower(),
                boost_mode=(node.get("boost_mode") or "multiply").lower(),
                max_boost=float(max_boost) if max_boost is not None else None,
                min_score=float(min_score) if min_score is not None else None,
                boost=boost * node_boost,
            )
            return matcher, scorer, node_sn

        if ntype == "rank_feature":
            node_boost = _validate_boost(node.get("boost"))
            matcher = MatchAll()
            node_sn = SNRankFeature(
                matcher=matcher,
                field=node["field"],
                modifier=(node.get("modifier") or "none").lower(),
                missing=float(node.get("missing") if node.get("missing") is not None else 0.0),
                boost=boost * node_boost,
            )
            return matcher, None, node_sn

        if ntype == "script_score":
            node_boost = _validate_boost(node.get("boost"))
            matcher, scorer, base_sn = self.build(node["query"], score, boost)
            node_sn = SNScriptScore(
                matcher=matcher,
                base=base_sn,
                script=node["script"],
                params=dict(node.get("params") or {}),
                boost=boost * node_boost,
            )
            return matcher, scorer, node_sn

        raise ValueError(f"unsupported query node type `{ntype}`")


def build_query_plan(
    request: dict, schema: IndexSchema, default_fields: list[str] | None = None
) -> tuple[QueryPlan, "PlanBuilder"]:
    """Compile a SearchRequest dict.  `query` may be a string
    (query_string shorthand, api/types.rs:90-95) or a QueryNode dict."""
    if default_fields is None:
        default_fields = list(request.get("fields") or schema.text_field_names)
    query = request.get("query", {"type": "match_all"})
    if isinstance(query, str):
        query = {"type": "query_string", "query": query}
    builder = PlanBuilder(default_fields)
    score = _request_scores(request)
    matcher, scorer, score_node = builder.build(query, score, 1.0)
    plan = QueryPlan(
        matcher=matcher,
        term_groups=[],      # filled by expand
        phrase_specs=[],     # filled by expand
        qualified_terms=[],  # filled by expand
        score_expr=scorer,
        score_node=score_node,
        root_filter=list(request.get("filter") or []),
    )
    return plan, builder


def _request_scores(request: dict) -> bool:
    """Scoring can be skipped when the sort plan doesn't use _score
    (match-only mode, wand.rs:568-656).  Default sort is _score."""
    sort = request.get("sort")
    if not sort:
        return True
    for s in sort:
        fld = s if isinstance(s, str) else s.get("field")
        if fld == "_score":
            return True
    return False


def expand_phrases(
    builder: PlanBuilder, schema: IndexSchema
) -> list[PhraseSpec]:
    """Analyze each phrase per field into position-bucketed token
    alternatives (reader.rs:1600-1647)."""
    specs = []
    for pid, (fields, terms, slop) in enumerate(builder.phrase_specs):
        field_tokens: dict[str, list[list[str]]] = {}
        body = " ".join(terms)
        for f in fields:
            kind = None
            try:
                kind = schema.field_kind(f)
            except ValueError:
                continue
            if kind == "text":
                analyzer = schema.search_analyzer_for(f)
                toks = analyzer(body)
                if not toks:
                    continue
                buckets: list[list[str]] = []
                for text, pos in toks:
                    while len(buckets) <= pos:
                        buckets.append([])
                    if text not in buckets[pos]:
                        buckets[pos].append(text)
                field_tokens[f] = buckets
            elif kind == "keyword":
                from searchlite_spark.analysis.tokenizers import normalize_keyword

                joined = normalize_keyword(body)
                if joined:
                    field_tokens[f] = [[joined]]
        specs.append(PhraseSpec(pid, field_tokens, slop))
    return specs
