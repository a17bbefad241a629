"""Sorted-path keyset pagination (reader.rs:614-901 sort cursors) and
deterministic sampler aggregation (aggs/mod.rs:47-129)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchlite_spark.query.aggs import run_aggregations, sampler_filter


@pytest.fixture(scope="module")
def page_index(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema,
        KeywordField,
        NumericField,
        TextField,
        build_index,
    )

    rows = [
        (i, f"alpha beta doc{i} gamma", "en" if i % 2 else "de", (i * 37) % 11)
        for i in range(40)
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id LONG, body STRING, lang STRING, rank LONG"
    )
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
        numeric_fields=(NumericField("rank"),),
    )
    out = str(tmp_path_factory.mktemp("page_index"))
    from searchlite_spark.query import Searcher

    return Searcher(build_index(spark, corpus, schema, out,
                                num_partitions=2, id_mode="column"))


def test_sorted_search_after_three_pages(page_index):
    """Walking a field-sorted result set page by page covers the full
    ordering with no overlap and no gap — ties (rank repeats every 11
    docs) are broken by the doc_id cursor component."""
    s = page_index
    req = {"query": "alpha", "sort": [{"field": "rank", "order": "desc"}],
           "limit": 15}
    full = (
        s.search_df(dict(req, limit=40))
        .select("doc_id", "rank")
        .collect()
    )
    expected = [(r["doc_id"], r["rank"]) for r in full]

    pages = []
    cursor = None
    for _ in range(3):
        r = dict(req)
        if cursor is not None:
            r["search_after"] = cursor
        resp = s.search(r)
        hits = resp["hits"]
        if not hits:
            break
        pages.extend((h["doc_id"], h["fields"]["rank"]) for h in hits)
        cursor = resp["next_search_after"]
        assert cursor[-1] == hits[-1]["doc_id"]
    assert pages == expected


def test_default_sort_search_after_unchanged(page_index):
    s = page_index
    r1 = s.search({"query": "alpha beta", "limit": 5})
    cur = r1["next_search_after"]
    assert cur == [r1["hits"][-1]["score"], r1["hits"][-1]["doc_id"]]
    r2 = s.search({"query": "alpha beta", "limit": 5, "search_after": cur})
    ids1 = {h["doc_id"] for h in r1["hits"]}
    ids2 = {h["doc_id"] for h in r2["hits"]}
    assert not ids1 & ids2


def test_search_after_wrong_arity_raises(page_index):
    with pytest.raises(ValueError):
        page_index.search(
            {"query": "alpha", "sort": [{"field": "rank"}],
             "search_after": [1]}
        )


def test_sampler_deterministic(spark, page_index):
    s = page_index
    m = s.match_set({"query": "alpha"})
    a = sorted(r["doc_id"] for r in sampler_filter(m, 0.5, seed=42).collect())
    b = sorted(r["doc_id"] for r in sampler_filter(m, 0.5, seed=42).collect())
    c = sorted(r["doc_id"] for r in sampler_filter(m, 0.5, seed=7).collect())
    assert a == b
    assert a != c
    assert 0 < len(a) < 40


def test_sampler_agg_response(spark, page_index):
    s = page_index
    m = s.match_set({"query": "alpha"})
    out = run_aggregations(
        m, s.docs,
        {"smp": {"sampler": {"probability": 0.5, "seed": 42,
                             "aggs": {"st": {"stats": {"field": "rank"}}}}}},
    )
    smp = out["smp"]
    assert smp["sampled"] is True
    assert smp["st"]["count"] == smp["doc_count"]
    assert 0 < smp["doc_count"] < 40


def test_sampler_probability_validation(page_index):
    m = page_index.match_set({"query": "alpha"})
    with pytest.raises(ValueError):
        sampler_filter(m, 0.0)


def test_percentiles_approximate_path(spark, page_index):
    """approx_percentile sketch path (the t-digest analogue for >256
    values) stays within tolerance of the exact path."""
    from searchlite_spark.query.aggs import percentiles_agg, _matched_docs

    s = page_index
    m = s.match_set({"query": "alpha"})
    md = _matched_docs(m, s.docs, ["rank"])
    exact = {r["percent"]: r["value"]
             for r in percentiles_agg(md, "rank", [50.0, 95.0]).collect()}
    approx = {r["percent"]: r["value"]
              for r in percentiles_agg(md, "rank", [50.0, 95.0],
                                       approximate=True).collect()}
    for p in (50.0, 95.0):
        assert abs(exact[p] - approx[p]) <= 1.0
