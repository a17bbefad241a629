"""Nested same-object filter semantics (query/filters.rs:52-82) and
multi-value sort (sort.rs min/max by direction, missing last)."""

import pytest

from searchlite_spark.query import Searcher


@pytest.fixture(scope="module")
def nested_index(spark, tmp_path_factory):
    from searchlite_spark.index import IndexSchema, TextField, build_index
    from pyspark.sql import Row

    rows = [
        Row(_id="n1", body="rust nested",
            review=[Row(user="user_a", rating=5), Row(user="user_b", rating=9)],
            prices=[10, 50]),
        Row(_id="n2", body="rust nested",
            review=[Row(user="user_a", rating=9), Row(user="user_b", rating=4)],
            prices=[30]),
        Row(_id="n3", body="rust nested",
            review=[Row(user="user_c", rating=5)],
            prices=None),
    ]
    corpus = spark.createDataFrame(rows)
    schema = IndexSchema(doc_id_field="_id", text_fields=(TextField("body"),))
    out = str(tmp_path_factory.mktemp("nested_index"))
    return build_index(spark, corpus, schema, out, num_partitions=2)


@pytest.fixture(scope="module")
def s(nested_index):
    return Searcher(nested_index)


def test_nested_same_object(s):
    # user_a AND rating in [3,6] must hold within ONE review object:
    # n1 has user_a/5 (yes); n2 has user_a/9 and user_b/4 (no single
    # object satisfies both)
    res = s.search({
        "query": "rust",
        "filter": [
            {"And": [
                {"Nested": {"path": "review",
                            "filter": {"KeywordEq": {"field": "user", "value": "user_a"}}}},
                {"Nested": {"path": "review",
                            "filter": {"I64Range": {"field": "rating", "min": 3, "max": 6}}}},
            ]}
        ],
        "limit": 10,
    })
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"n1"}


def test_nested_single_filter(s):
    res = s.search({
        "query": "rust",
        "filter": [{"Nested": {"path": "review",
                               "filter": {"KeywordEq": {"field": "user", "value": "USER_A"}}}}],
        "limit": 10,
    })
    ids = {h["fields"]["_id"] for h in res["hits"]}
    assert ids == {"n1", "n2"}


def test_multivalue_sort_asc_uses_min_missing_last(s):
    res = s.search({
        "query": "rust",
        "sort": [{"field": "prices", "order": "asc"}],
        "limit": 10,
    })
    ids = [h["fields"]["_id"] for h in res["hits"]]
    # asc by min: n1 (10) < n2 (30); n3 missing -> last
    assert ids == ["n1", "n2", "n3"]


def test_multivalue_sort_desc_uses_max(s):
    res = s.search({
        "query": "rust",
        "sort": [{"field": "prices", "order": "desc"}],
        "limit": 10,
    })
    ids = [h["fields"]["_id"] for h in res["hits"]]
    # desc by max: n1 (50) > n2 (30); n3 missing -> last
    assert ids == ["n1", "n2", "n3"]


def test_search_after_pagination(s):
    all_hits = s.search({"query": "rust", "limit": 10})["hits"]
    page1 = s.search({"query": "rust", "limit": 2})
    after = page1["next_search_after"]
    page2 = s.search({"query": "rust", "limit": 2, "search_after": after})
    ids1 = [h["doc_id"] for h in page1["hits"]]
    ids2 = [h["doc_id"] for h in page2["hits"]]
    assert ids1 + ids2 == [h["doc_id"] for h in all_hits][: len(ids1) + len(ids2)]
    assert not set(ids1) & set(ids2)
