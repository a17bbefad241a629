"""function_score / rank_feature / script_score / constant_score
semantics (reference tests/function_score.rs flavors)."""

import math

import pytest

from searchlite_spark.query import Searcher


@pytest.fixture(scope="module")
def fs_index(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema, KeywordField, NumericField, TextField, build_index,
    )

    rows = [
        ("a", "rust fast", "en", 10, 2.0),
        ("b", "rust slow", "en", 100, 0.5),
        ("c", "rust medium", "de", 1000, 1.0),
        ("d", "other words", "en", 50, 3.0),
    ]
    corpus = spark.createDataFrame(
        rows, "_id STRING, body STRING, lang STRING, popularity LONG, rank DOUBLE"
    )
    schema = IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
        numeric_fields=(NumericField("popularity"), NumericField("rank", i64=False)),
    )
    out = str(tmp_path_factory.mktemp("fs_index"))
    return build_index(spark, corpus, schema, out, num_partitions=2)


@pytest.fixture(scope="module")
def s(fs_index):
    return Searcher(fs_index)


def _hits(s, req):
    res = s.search(req)
    return [(h["fields"]["_id"], h["score"]) for h in res["hits"]]


def test_constant_score(s):
    hits = _hits(s, {
        "query": {"type": "constant_score",
                  "filter": {"KeywordEq": {"field": "lang", "value": "en"}},
                  "boost": 2.5},
        "limit": 10,
    })
    assert {h[0] for h in hits} == {"a", "b", "d"}
    assert all(abs(sc - 2.5) < 1e-9 for _, sc in hits)


def test_function_score_weight_replace(s):
    hits = _hits(s, {
        "query": {"type": "function_score",
                  "query": "rust",
                  "functions": [{"type": "weight", "weight": 7.0}],
                  "boost_mode": "replace"},
        "limit": 10,
    })
    assert {h[0] for h in hits} == {"a", "b", "c"}
    assert all(abs(sc - 7.0) < 1e-6 for _, sc in hits)


def test_field_value_factor_ordering(s):
    hits = _hits(s, {
        "query": {"type": "function_score",
                  "query": "rust",
                  "functions": [{"type": "field_value_factor",
                                 "field": "popularity", "factor": 1.0}],
                  "boost_mode": "replace"},
        "limit": 10,
    })
    # popularity replaces the score: c(1000) > b(100) > a(10)
    assert [h[0] for h in hits] == ["c", "b", "a"]


def test_field_value_factor_log1p_modifier(s):
    hits = _hits(s, {
        "query": {"type": "function_score",
                  "query": "rust",
                  "functions": [{"type": "field_value_factor",
                                 "field": "popularity", "factor": 1.0,
                                 "modifier": "log1p"}],
                  "boost_mode": "replace"},
        "limit": 10,
    })
    expect = {"a": math.log1p(10), "b": math.log1p(100), "c": math.log1p(1000)}
    for doc, sc in hits:
        assert abs(sc - expect[doc]) < 1e-6


def test_decay_ordering(s):
    # origin 10: a(10) closest, then b(100), then c(1000)
    hits = _hits(s, {
        "query": {"type": "function_score",
                  "query": "rust",
                  "functions": [{"type": "decay", "field": "popularity",
                                 "origin": 10.0, "scale": 100.0}],
                  "boost_mode": "replace"},
        "limit": 10,
    })
    assert [h[0] for h in hits] == ["a", "b", "c"]
    assert abs(hits[0][1] - 1.0) < 1e-6  # decay(0) = 1


def test_min_score_drops(s):
    hits = _hits(s, {
        "query": {"type": "function_score",
                  "query": "rust",
                  "functions": [{"type": "field_value_factor",
                                 "field": "popularity", "factor": 1.0}],
                  "boost_mode": "replace",
                  "min_score": 50.0},
        "limit": 10,
    })
    assert {h[0] for h in hits} == {"b", "c"}


def test_max_boost_clamps(s):
    hits = _hits(s, {
        "query": {"type": "function_score",
                  "query": "rust",
                  "functions": [{"type": "field_value_factor",
                                 "field": "popularity", "factor": 1.0}],
                  "boost_mode": "replace",
                  "max_boost": 99.0},
        "limit": 10,
    })
    assert max(sc for _, sc in hits) <= 99.0


def test_filtered_function_only_applies_to_matching_docs(s):
    hits = _hits(s, {
        "query": {"type": "function_score",
                  "query": "rust",
                  "functions": [{"type": "weight", "weight": 100.0,
                                 "filter": {"KeywordEq": {"field": "lang",
                                                          "value": "de"}}}],
                  "boost_mode": "replace"},
        "limit": 10,
    })
    by_id = dict(hits)
    assert abs(by_id["c"] - 100.0) < 1e-6
    # a/b: no active function -> base bm25 score (unchanged, < 100)
    assert by_id["a"] < 10 and by_id["b"] < 10


def test_rank_feature(s):
    hits = _hits(s, {
        "query": {"type": "rank_feature", "field": "rank"},
        "limit": 10,
    })
    # match_all + score = rank value: d(3.0) > a(2.0) > c(1.0) > b(0.5)
    assert [h[0] for h in hits] == ["d", "a", "c", "b"]
    assert abs(hits[0][1] - 3.0) < 1e-9


def test_script_score(s):
    hits = _hits(s, {
        "query": {"type": "script_score",
                  "query": "rust",
                  "script": "_score * 0 + popularity / scale",
                  "params": {"scale": 10.0}},
        "limit": 10,
    })
    expect = {"a": 1.0, "b": 10.0, "c": 100.0}
    for doc, sc in hits:
        assert abs(sc - expect[doc]) < 1e-9


def test_script_score_div_by_zero_drops(s):
    hits = _hits(s, {
        "query": {"type": "script_score",
                  "query": "rust",
                  "script": "1 / (popularity - 10)"},
        "limit": 10,
    })
    # a has popularity 10 -> div by zero -> dropped
    assert {h[0] for h in hits} == {"b", "c"}


def test_script_score_parse_errors(s):
    with pytest.raises(Exception):
        s.search({"query": {"type": "script_score", "query": "rust",
                            "script": "1 +"}, "limit": 5})
    with pytest.raises(Exception):
        s.search({"query": {"type": "script_score", "query": "rust",
                            "script": "(1 + 2"}, "limit": 5})
