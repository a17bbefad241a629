"""batch_topk: N queries in one pass, row-identical to the
single-query engine (the batch path's contract)."""

import random

import pytest


VOCAB = [
    "rust", "search", "engine", "fast", "tiny", "wand", "bmw",
    "sqlite", "index", "language", "systems", "programming",
]


@pytest.fixture(scope="module")
def batch_searcher(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema, KeywordField, TextField, build_index,
    )
    from searchlite_spark.query import Searcher

    rng = random.Random(99)
    rows = []
    for i in range(300):
        n = rng.randint(4, 12)
        words = [
            VOCAB[min(int(rng.expovariate(0.4)), len(VOCAB) - 1)]
            for _ in range(n)
        ]
        rows.append((i, " ".join(words), rng.choice(["en", "de"])))
    corpus = spark.createDataFrame(rows, "doc_id LONG, body STRING, lang STRING")
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
    )
    out = str(tmp_path_factory.mktemp("batch_index"))
    return Searcher(
        build_index(spark, corpus, schema, out, num_partitions=4, id_mode="column")
    )


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["rank"])
    return out


def test_batch_matches_single_query(batch_searcher):
    from searchlite_spark.query import batch_topk

    rng = random.Random(5)
    reqs = {
        f"q{i}": {"query": " ".join(rng.sample(VOCAB, rng.randint(1, 3)))}
        for i in range(8)
    }
    got = _by_query(batch_topk(batch_searcher, reqs, k=7).collect())
    for qid, req in reqs.items():
        single = [
            (r["doc_id"], r["score"])
            for r in batch_searcher.topk({**req, "limit": 7}).collect()
        ]
        batch = [(r["doc_id"], r["score"]) for r in got.get(qid, [])]
        assert len(single) == len(batch), (qid, req)
        for (sd, ss), (bd, bs) in zip(single, batch):
            assert sd == bd, (qid, req, single, batch)
            assert abs(ss - bs) < 1e-9, (qid, req)


def test_batch_ranks_are_dense_and_ordered(batch_searcher):
    from searchlite_spark.query import batch_topk

    got = _by_query(
        batch_topk(batch_searcher, {"a": {"query": "rust search"}}, k=5).collect()
    )["a"]
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    for hi, lo in zip(got, got[1:]):
        assert (f32(hi["score"]), -hi["doc_id"]) >= (f32(lo["score"]), -lo["doc_id"])


def test_batch_weighted_duplicate_terms_sum(batch_searcher):
    """'rust rust' doubles the weight of 'rust' (reader.rs:2971-2983)
    — the batch path must match the single-query summing exactly."""
    from searchlite_spark.query import batch_topk

    got = _by_query(
        batch_topk(batch_searcher, {"d": {"query": "rust rust"}}, k=5).collect()
    )["d"]
    single = [
        (r["doc_id"], r["score"])
        for r in batch_searcher.topk({"query": "rust rust", "limit": 5}).collect()
    ]
    assert [(r["doc_id"], r["score"]) for r in got] == pytest.approx(single)


def test_batch_absent_terms_yield_no_rows(batch_searcher):
    from searchlite_spark.query import batch_topk

    out = batch_topk(
        batch_searcher,
        {"x": {"query": "zzzznothere"}, "y": {"query": "rust"}},
        k=3,
    ).collect()
    by = _by_query(out)
    assert "x" not in by
    assert len(by["y"]) == 3


def test_batch_rejects_non_scored_or(batch_searcher):
    from searchlite_spark.query import BatchUnsupportedQuery, batch_topk

    for bad in (
        {"query": '"rust search"'},  # phrase
        {"query": "rust -search"},  # negation
        {
            "query": "rust",
            "filter": [{"KeywordEq": {"field": "lang", "value": "en"}}],
        },  # filter
    ):
        with pytest.raises(BatchUnsupportedQuery):
            batch_topk(batch_searcher, {"q": bad}, k=3)


def test_batch_empty_and_bad_k(batch_searcher):
    from searchlite_spark.query import batch_topk

    with pytest.raises(ValueError):
        batch_topk(batch_searcher, {}, k=3)
    with pytest.raises(ValueError):
        batch_topk(batch_searcher, {"q": {"query": "rust"}}, k=0)


def test_batch_large_k_crosses_partitions(batch_searcher, spark):
    """k larger than any one partition's share of a query's matches:
    the partial/final WindowGroupLimit pair must still return the
    globally correct per-query ranking."""
    from searchlite_spark.query import batch_topk

    got = _by_query(batch_topk(batch_searcher, {"q": {"query": "rust"}}, k=50).collect())["q"]
    single = [
        (r["doc_id"], r["score"])
        for r in batch_searcher.topk({"query": "rust", "limit": 50}).collect()
    ]
    assert [(r["doc_id"], r["score"]) for r in got] == pytest.approx(single)


def test_batch_plan_bounds_topk(batch_searcher):
    """Pin the scale-critical plan shape: the per-query rank must
    execute as a PARTIAL WindowGroupLimit before the query_id exchange
    (bounding any query's rows at S*k), the postings scan must push
    the union term set, and the per-query term table must broadcast.
    A regression to full-sort-per-query or a non-pushed scan would
    silently reintroduce the 10^12-doc funnel."""
    from searchlite_spark.query import batch_topk

    df = batch_topk(
        batch_searcher, {"a": {"query": "rust"}, "b": {"query": "search"}}, k=4
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "term" in plan and "IN (" in plan  # pushed union term set
    assert "partial_sum" in plan  # map-side combine of contributions


@pytest.fixture(scope="module")
def two_field_searcher(spark, tmp_path_factory):
    from searchlite_spark.index import IndexSchema, TextField, build_index
    from searchlite_spark.query import Searcher

    rng = random.Random(3)
    rows = []
    for i in range(200):
        body = " ".join(
            VOCAB[min(int(rng.expovariate(0.4)), len(VOCAB) - 1)]
            for _ in range(rng.randint(6, 14))
        )
        title = " ".join(rng.sample(VOCAB, rng.randint(1, 3)))
        rows.append((i, body, title))
    corpus = spark.createDataFrame(rows, "doc_id LONG, body STRING, title STRING")
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"), TextField("title")),
    )
    out = str(tmp_path_factory.mktemp("batch_two_field"))
    return Searcher(
        build_index(spark, corpus, schema, out, num_partitions=4, id_mode="column")
    )


def test_batch_multi_field_avgdl(two_field_searcher):
    """Two text fields with different avgdl: the batch per-key avgdl
    lookup must reproduce the single-query scoring on both fields —
    a query_string over the default fields scores body AND title
    occurrences with each field's own length normalization."""
    from searchlite_spark.query import batch_topk

    reqs = {
        "t1": {"query": "rust engine"},
        "t2": {"query": "wand"},
        "t3": {"query": {"type": "term", "field": "title", "value": "search"}},
    }
    got = _by_query(batch_topk(two_field_searcher, reqs, k=8).collect())
    for qid, req in reqs.items():
        single = [
            (r["doc_id"], r["score"])
            for r in two_field_searcher.topk({**req, "limit": 8}).collect()
        ]
        batch = [(r["doc_id"], r["score"]) for r in got.get(qid, [])]
        assert len(single) == len(batch), (qid, single, batch)
        for (sd, ss), (bd, bs) in zip(single, batch):
            assert sd == bd and abs(ss - bs) < 1e-9, (qid, single, batch)


def test_batch_validates_request_contract(batch_searcher):
    """Every batch member passes the same pre-job contract gate as
    search()/topk(): a typo'd key fails fast instead of silently
    returning an un-intended ranking."""
    from searchlite_spark.query import batch_topk
    from searchlite_spark.query.validate import RequestValidationError

    with pytest.raises(RequestValidationError):
        batch_topk(batch_searcher, {"q": {"quer": "rust"}}, k=3)
    with pytest.raises(RequestValidationError):
        batch_topk(
            batch_searcher, {"q": {"query": "rust", "rescor": {}}}, k=3
        )


def test_batch_per_request_limit(batch_searcher):
    """A member's own `limit` overrides the batch k — and mixed limits
    still match the single-query results per query."""
    from searchlite_spark.query import batch_topk

    reqs = {
        "small": {"query": "rust", "limit": 3},
        "big": {"query": "search", "limit": 12},
        "default": {"query": "engine"},
    }
    got = _by_query(batch_topk(batch_searcher, reqs, k=5).collect())
    assert len(got["small"]) == 3
    assert len(got["big"]) == 12
    assert len(got["default"]) == 5
    for qid, n in (("small", 3), ("big", 12), ("default", 5)):
        single = [
            (r["doc_id"], r["score"])
            for r in batch_searcher.topk(
                {"query": reqs[qid]["query"], "limit": n}
            ).collect()
        ]
        assert [(r["doc_id"], r["score"]) for r in got[qid]] == pytest.approx(single)
    from searchlite_spark.query.validate import RequestValidationError

    with pytest.raises(RequestValidationError, match="limit"):
        batch_topk(batch_searcher, {"q": {"query": "rust", "limit": 0}}, k=5)
