"""Request-contract validation matrix (search-request.schema.json
mirror): every malformed shape fails fast with
RequestValidationError BEFORE any Spark job, and every valid shape —
including the repo extensions — passes through unchanged."""

from __future__ import annotations

import pytest

from searchlite_spark.query.validate import (
    RequestValidationError,
    validate_request,
)

BAD = [
    # not a dict / missing query / wrong-typed query
    ("not-a-dict", "must be a dict"),
    ({}, "missing required `query`"),
    ({"query": 7}, "`query` must be"),
    # unknown top-level key (the typo'd-block silent-wrong-answer class)
    ({"query": "a", "rescor": {}}, "unknown top-level request key"),
    ({"query": "a", "qurey": "b"}, "unknown top-level request key"),
    # known-in-the-reference keys served elsewhere here: redirect
    ({"query": "a", "vector_query": {}}, "hybrid_multi_topk"),
    ({"query": "a", "vector_filter": {}}, "hybrid_multi_topk"),
    # wrong-typed bodies
    ({"query": "a", "limit": 0}, "`limit`"),
    ({"query": "a", "limit": True}, "`limit`"),
    ({"query": "a", "limit": "10"}, "`limit`"),
    ({"query": "a", "fields": "text"}, "`fields`"),
    ({"query": "a", "filter": "lang:en"}, "`filter`"),
    ({"query": "a", "filter": [{"KeywordEq": {}, "extra": {}}]}, "single-key"),
    ({"query": "a", "sort": "n_chars"}, "`sort` must be a list"),
    ({"query": "a", "sort": [{"order": "asc"}]}, "missing required `field`"),
    ({"query": "a", "sort": [{"field": "x", "order": "up"}]}, "asc"),
    ({"query": "a", "sort": [{"field": "x", "mode": "min"}]}, "unknown key"),
    ({"query": "a", "cursor": 12}, "`cursor`"),
    ({"query": "a", "execution": "turbo"}, "`execution`"),
    ({"query": "a", "bmw_block_size": 0}, "`bmw_block_size`"),
    ({"query": "a", "candidate_size": -5}, "`candidate_size`"),
    ({"query": "a", "fuzzy": {"max_edits": 1, "typo": 2}}, "unknown key"),
    ({"query": "a", "fuzzy": {"max_edits": "two"}}, "`fuzzy.max_edits`"),
    ({"query": "a", "return_hits": "yes"}, "`return_hits`"),
    ({"query": "a", "explain": 1}, "`explain`"),
    ({"query": "a", "highlight": {"felds": {}}}, "unknown key"),
    ({"query": "a", "highlight": {"fields": {"text": {"pretag": "x"}}}},
     "unknown key"),
    ({"query": "a",
      "highlight": {"fields": {"text": {"fragment_size": 0}}}},
     "fragment_size"),
    ({"query": "a", "collapse": "lang"}, "`collapse`"),
    ({"query": "a", "collapse": {"field": "lang", "inner": {}}},
     "unknown key"),
    ({"query": "a",
      "collapse": {"field": "lang", "inner_hits": {"size": -1}}},
     "inner_hits.size"),
    ({"query": "a", "aggs": {"t": "terms"}}, "`aggs`"),
    ({"query": "a", "suggest": {"s": {"prefix": "ru"}}},
     "requires `field` and `prefix`"),
    ({"query": "a", "suggest": {"s": {"field": "f", "prefix": "p",
                                      "fuzziness": 1}}},
     "unknown key"),
    ({"query": "a", "rescore": {"query": "b"}},
     "requires `window_size` and `query`"),
    ({"query": "a", "rescore": {"window_size": 10, "query": "b",
                                "score_mode": "avg"}},
     "score_mode"),
    ({"query": "a", "rescore": {"window_size": 10, "query": "b",
                                "window": 5}},
     "unknown key"),
    ({"query": "a", "track_total_hits": "exact"}, "track_total_hits"),
    ({"query": "a", "search_after": 42}, "`search_after`"),
]

GOOD = [
    {"query": "a"},
    {"query": {"type": "prefix", "field": "text", "value": "s"}},
    {"query": "a", "limit": 10, "fields": ["text"], "return_hits": False},
    {"query": "a", "filter": [{"KeywordEq": {"field": "lang", "value": "en"}}]},
    {"query": "a", "filter": {"KeywordEq": {"field": "lang", "value": "en"}}},
    {"query": "a", "sort": ["n_chars", {"field": "lang", "order": "desc"}]},
    {"query": "a", "execution": "bmw", "bmw_block_size": 64},
    {"query": "a", "fuzzy": {"max_edits": 2, "prefix_length": 1}},
    {"query": "a", "highlight": {"fields": {"text": {
        "pre_tag": "<b>", "post_tag": "</b>",
        "fragment_size": 100, "number_of_fragments": 2}}}},
    {"query": "a", "highlight_field": "text"},
    {"query": "a", "collapse": {"field": "lang",
                                "inner_hits": {"size": 2, "sort": ["n_chars"]}}},
    {"query": "a", "aggs": {"t": {"terms": {"field": "lang"}}}},
    {"query": "a", "suggest": {"s": {"field": "text", "prefix": "ru",
                                     "size": 3}}},
    {"query": "a", "rescore": {"window_size": 20, "query": "b",
                               "score_mode": "multiply"}},
    {"query": "a", "track_total_hits": 100},
    {"query": "a", "search_after": [42, 7], "sort": ["n_chars"]},
    {"query": "a", "cursor": "deadbeef"},
    {"query": "a", "candidate_size": 500, "explain": True, "profile": True,
     "return_stored": True},
]


@pytest.mark.parametrize("req,msg", BAD, ids=[m for _, m in BAD])
def test_malformed_requests_rejected(req, msg):
    with pytest.raises(RequestValidationError) as ei:
        validate_request(req)
    assert msg.lower() in str(ei.value).lower(), (
        f"message {ei.value!r} does not mention {msg!r}"
    )


@pytest.mark.parametrize(
    "req", GOOD, ids=[",".join(sorted(r)) for r in GOOD]
)
def test_valid_requests_pass(req):
    validate_request(req)


def test_search_rejects_before_any_job(tiny_index):
    """The gate is wired into the public search() entry — a typo'd
    block fails immediately (no Spark job)."""
    from searchlite_spark.query import Searcher

    s = Searcher(tiny_index)
    with pytest.raises(RequestValidationError, match="unknown top-level"):
        s.search({"query": "rust", "rescor": {"window_size": 5}})
    with pytest.raises(RequestValidationError, match="hybrid_multi_topk"):
        s.search_df({"query": "rust", "vector_query": {}})
