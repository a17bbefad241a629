"""collapse / rescore / suggest / highlight (reference tests/smoke.rs
collapse+inner_hits, function_score.rs rescore window, prefix_and_suggest.rs)."""

import pytest

from searchlite_spark.query import Searcher


@pytest.fixture(scope="module")
def pp_index(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema, KeywordField, NumericField, TextField, build_index,
    )

    rows = [
        ("a1", "rust rust rust", "alpha", 1),
        ("a2", "rust rust", "alpha", 2),
        ("a3", "rust", "alpha", 3),
        ("b1", "rust rust", "beta", 4),
        ("b2", "rust fast engine", "beta", 5),
        ("c1", "python slow", "gamma", 6),
    ]
    corpus = spark.createDataFrame(
        rows, "_id STRING, body STRING, grp STRING, rank LONG"
    )
    schema = IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("grp"),),
        numeric_fields=(NumericField("rank"),),
    )
    out = str(tmp_path_factory.mktemp("pp_index"))
    return build_index(spark, corpus, schema, out, num_partitions=2)


@pytest.fixture(scope="module")
def s(pp_index):
    return Searcher(pp_index)


def test_collapse_groups(s):
    res = s.search({"query": "rust", "collapse": {"field": "grp"}, "limit": 10})
    assert res["total_groups"] == 2
    ids = [h["fields"]["_id"] for h in res["hits"]]
    assert len(ids) == 2
    # representative = best scorer per group: a1 (tf=3), b1 (tf=2, shorter than b2... bm25 decides)
    assert ids[0] == "a1"
    keys = {h["collapse_key"] for h in res["hits"]}
    assert keys == {"alpha", "beta"}


def test_collapse_inner_hits(s):
    res = s.search({
        "query": "rust",
        "collapse": {"field": "grp", "inner_hits": {"size": 2}},
        "limit": 10,
    })
    by_key = {h["collapse_key"]: h for h in res["hits"]}
    inner_alpha = by_key["alpha"]["inner_hits"]
    assert 1 <= len(inner_alpha) <= 2
    assert all(i["doc_id"] != by_key["alpha"]["doc_id"] for i in inner_alpha)


def test_rescore_window_reorder(s):
    # rescore boosts docs containing "fast" massively
    res = s.search({
        "query": "rust",
        "rescore": {
            "window_size": 10,
            "query": {"type": "function_score",
                      "query": {"type": "term", "field": "body", "value": "fast"},
                      "functions": [{"type": "weight", "weight": 100.0}],
                      "boost_mode": "replace"},
            "score_mode": "total",
        },
        "limit": 3,
    })
    assert res["hits"][0]["fields"]["_id"] == "b2"


def test_rescore_nonmatching_keep_score(s):
    base = s.search({"query": "rust", "limit": 10})
    res = s.search({
        "query": "rust",
        "rescore": {"window_size": 10,
                    "query": {"type": "term", "field": "body", "value": "zzz"}},
        "limit": 10,
    })
    assert len(res["hits"]) == len(base["hits"])
    base_scores = {h["doc_id"]: h["score"] for h in base["hits"]}
    for h in res["hits"]:
        assert abs(h["score"] - base_scores[h["doc_id"]]) < 1e-9


def test_suggest_completion(s):
    res = s.search({
        "query": {"type": "match_all"},
        "limit": 1,
        "suggest": {"sug": {"type": "completion", "field": "body", "prefix": "ru"}},
    })
    opts = res["suggest"]["sug"]["options"]
    assert opts[0]["text"] == "rust"
    assert opts[0]["doc_freq"] == 5
    assert opts[0]["score"] == 5.0


def test_suggest_fuzzy(s):
    from searchlite_spark.query.postprocess import suggest_completion

    opts = suggest_completion(s, "body", "rast", 5, fuzzy={"max_edits": 1})
    assert any(o["text"] == "rust" for o in opts)
    rust = next(o for o in opts if o["text"] == "rust")
    assert abs(rust["score"] - 5.0 / 2.0) < 1e-6  # df/(dist+1)


def test_highlight(s):
    res = s.search({
        "query": "fast engine",
        "highlight": {"fields": {"body": {}}},
        "limit": 5,
    })
    h = res["hits"][0]
    assert "highlight" in h
    frag = h["highlight"]["body"][0]
    assert "<em>fast</em>" in frag and "<em>engine</em>" in frag


def test_snippet_legacy(s):
    res = s.search({"query": "python", "highlight_field": "body", "limit": 5})
    assert res["hits"][0]["snippet"] == "**python** slow"


def test_phrase_highlight(s):
    res = s.search({
        "query": '"fast engine"',
        "highlight": {"fields": {"body": {}}},
        "limit": 5,
    })
    h = res["hits"][0]
    assert "<em>fast engine</em>" in h["highlight"]["body"][0]
