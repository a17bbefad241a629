"""End-to-end smoke: build a tiny index, run README-level queries
(reference README.md:155-177 flavor) and check BM25 parity invariants."""

import math

import pytest

from searchlite_spark.query import Searcher


@pytest.fixture(scope="module")
def searcher(tiny_index):
    return Searcher(tiny_index)


def test_manifest_stats(tiny_index):
    stats = tiny_index.stats
    assert stats["n_docs"] == 3
    # doc1: 9 tokens, doc2: 10, doc3: 5 => avgdl 8
    assert stats["total_tokens"]["body"] == 9 + 10 + 5
    assert abs(stats["avgdl"]["body"] - 8.0) < 1e-6


def test_doc_ids_ordered_by_key(tiny_index):
    rows = tiny_index.docs().select("doc_id", "_id").orderBy("doc_id").collect()
    assert [r["_id"] for r in rows] == ["doc1", "doc2", "doc3"]
    assert [r["doc_id"] for r in rows] == [0, 1, 2]


def test_term_dictionary(tiny_index):
    terms = {r["term"]: r for r in tiny_index.terms().collect()}
    assert terms["body:rust"]["df"] == 2
    assert terms["body:programming"]["df"] == 2
    assert terms["lang:en"]["df"] == 2
    assert terms["lang:de"]["df"] == 1


def test_single_term_search(searcher):
    res = searcher.search({"query": "rust", "limit": 5})
    assert res["total_hits_estimate"] == 2
    ids = [h["fields"]["_id"] for h in res["hits"]]
    assert set(ids) == {"doc1", "doc3"}
    # doc3 is shorter => higher bm25 for equal tf
    assert ids[0] == "doc3"


def test_bm25_value_exact(searcher, tiny_index):
    """Hand-computed BM25 (bm25.rs:1-6, k1=0.9 b=0.4)."""
    res = searcher.search({"query": "rust", "limit": 5})
    n, df = 3.0, 2.0
    avgdl = 8.0
    idf = max(math.log((n - df + 0.5) / (df + 0.5)), 0.0) + 1.0
    from searchlite_spark.analysis.tokenizers import default_tokenize

    for h in res["hits"]:
        dl = float(len(default_tokenize(h["fields"]["body"])))
        tf = 1.0
        denom = tf + 0.9 * (1 - 0.4 + 0.4 * dl / avgdl)
        expect = idf * tf * 1.9 / max(denom, 1e-6)
        assert abs(h["score"] - expect) < 1e-5


def test_multi_term_or_semantics(searcher):
    # OR semantics, min 1 match
    res = searcher.search({"query": "rust python", "limit": 5})
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc1", "doc2", "doc3"}


def test_negation(searcher):
    res = searcher.search({"query": "programming -rust", "limit": 5})
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc2"}


def test_field_qualified(searcher):
    res = searcher.search({"query": "lang:de", "limit": 5})
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc3"}


def test_phrase(searcher):
    res = searcher.search({"query": '"programming language"', "limit": 5})
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc1", "doc2"}
    res2 = searcher.search({"query": '"language programming"', "limit": 5})
    assert res2["total_hits_estimate"] == 0


def test_phrase_slop(searcher):
    # "systems language" within slop 1 (one gap: programming)
    res = searcher.search(
        {"query": {"type": "phrase", "terms": ["systems", "language"], "slop": 1},
         "limit": 5}
    )
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc1"}
    res0 = searcher.search(
        {"query": {"type": "phrase", "terms": ["systems", "language"], "slop": 0},
         "limit": 5}
    )
    assert res0["total_hits_estimate"] == 0


def test_keyword_filter(searcher):
    res = searcher.search(
        {
            "query": "programming",
            "filter": [{"KeywordEq": {"field": "lang", "value": "EN"}}],
            "limit": 5,
        }
    )
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc1", "doc2"}


def test_numeric_range_filter(searcher):
    res = searcher.search(
        {
            "query": {"type": "match_all"},
            "filter": [{"I64Range": {"field": "year", "min": 2000, "max": 2020}}],
            "limit": 5,
        }
    )
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc1", "doc3"}


def test_bool_must_should(searcher):
    res = searcher.search(
        {
            "query": {
                "type": "bool",
                "must": [{"type": "term", "field": "body", "value": "programming"}],
                "must_not": [{"type": "term", "field": "body", "value": "python"}],
            },
            "limit": 5,
        }
    )
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"doc1"}


def test_sort_by_numeric(searcher):
    res = searcher.search(
        {"query": "programming", "sort": [{"field": "year", "order": "asc"}], "limit": 5}
    )
    ids = [h["fields"]["_id"] for h in res["hits"]]
    assert ids == ["doc2", "doc1"]


def test_zero_limit_rejected(searcher):
    with pytest.raises(ValueError):
        searcher.search({"query": "rust", "limit": 0})


def test_prefix_query(searcher):
    res = searcher.search(
        {"query": {"type": "prefix", "field": "body", "value": "program"}, "limit": 5}
    )
    ids = {h["fields"]["_id"] for h in res["hits"]}
    # "programmiersprache" (doc3) also matches the prefix
    assert ids == {"doc1", "doc2", "doc3"}


def test_multi_match_most_fields(searcher):
    res = searcher.search(
        {
            "query": {
                "type": "multi_match",
                "query": "rust schnell",
                "fields": ["body"],
                "match_type": "most_fields",
            },
            "limit": 5,
        }
    )
    ids = [h["fields"]["_id"] for h in res["hits"]]
    assert ids[0] == "doc3"  # matches both terms
