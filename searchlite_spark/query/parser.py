"""The ``query_string`` mini-language parser.

Same grammar as the reference (searchlite-core/src/api/query.rs:20-98):
whitespace-separated terms, optional ``field:`` prefix, ``-`` negation,
quoted phrases ``"a b"`` / ``"field:a b"`` (field prefix recognized only
when it is alphanumeric/underscore).  Phrases are filter-only.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class QueryTerm:
    field: str | None
    term: str


@dataclass
class PhraseQuery:
    field: str | None
    terms: list[str]


@dataclass
class ParsedQuery:
    terms: list[QueryTerm] = field(default_factory=list)
    phrases: list[PhraseQuery] = field(default_factory=list)
    not_terms: list[QueryTerm] = field(default_factory=list)


def _parse_terms(segment: str) -> tuple[list[QueryTerm], list[QueryTerm]]:
    out: list[QueryTerm] = []
    not_out: list[QueryTerm] = []
    for raw in segment.split():
        is_not = raw.startswith("-")
        token = raw.lstrip("-")
        if ":" in token:
            f, t = token.split(":", 1)
            qt = QueryTerm(f, t)
        else:
            qt = QueryTerm(None, token)
        (not_out if is_not else out).append(qt)
    return out, not_out


def parse_query(input_str: str) -> ParsedQuery:
    pq = ParsedQuery()
    rest = input_str.strip()
    while True:
        start = rest.find('"')
        if start < 0:
            break
        before = rest[:start].strip()
        if before:
            t, n = _parse_terms(before)
            pq.terms.extend(t)
            pq.not_terms.extend(n)
        after = rest[start + 1 :]
        end = after.find('"')
        if end < 0:
            rest = ""
            break
        body = after[:end]
        fld = None
        colon = body.find(":")
        if colon >= 0 and all(
            c.isalnum() or c == "_" for c in body[:colon]
        ) and body[:colon]:
            fld = body[:colon]
            body = body[colon + 1 :]
        terms = [t for t in body.split() if t]
        if terms:
            pq.phrases.append(PhraseQuery(fld, terms))
        rest = after[end + 1 :]
    if rest.strip():
        t, n = _parse_terms(rest)
        pq.terms.extend(t)
        pq.not_terms.extend(n)
    return pq
