"""Round-7 optimization internals: each rewritten execution path must be
row-identical to the general path it replaced, and the adaptive build
layout must hold its shape promises."""

import glob
import os

import pytest
from pyspark.sql import functions as F


VOCAB = [
    "rust", "search", "engine", "fast", "tiny", "wand", "bmw",
    "sqlite", "index", "language", "systems", "programming",
]


@pytest.fixture(scope="module")
def opt_searcher(spark, tmp_path_factory):
    import random

    from searchlite_spark.index import (
        IndexSchema, KeywordField, TextField, build_index,
    )
    from searchlite_spark.query import Searcher

    rng = random.Random(1234)
    rows = []
    for i in range(400):
        n = rng.randint(4, 14)
        words = [
            VOCAB[min(int(rng.expovariate(0.45)), len(VOCAB) - 1)]
            for _ in range(n)
        ]
        rows.append((i, " ".join(words), rng.choice(["en", "de", "fr"])))
    corpus = spark.createDataFrame(rows, "doc_id LONG, body STRING, lang STRING")
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
    )
    out = str(tmp_path_factory.mktemp("opt_idx"))
    return Searcher(
        build_index(spark, corpus, schema, out, id_mode="column")
    )


def _rows(searcher, req, k=400):
    return [
        (r["doc_id"], r["score"])
        for r in searcher.match_set(req)
        .orderBy(F.col("score").cast("float").desc(), F.asc("doc_id"))
        .limit(k)
        .collect()
    ]


def test_negation_antijoin_matches_general_path(opt_searcher, monkeypatch):
    """The anti-join negation rewrite must return exactly the general
    (group-array) path's rows — ids AND scores."""
    from searchlite_spark.query.engine import Searcher

    req = {"query": "rust -wand", "limit": 400}
    fast = _rows(opt_searcher, req)
    opt_searcher._plan_cache.clear()
    monkeypatch.setattr(
        Searcher, "_matcher_negation_split",
        staticmethod(lambda m, kg, ak: None),
    )
    general = _rows(opt_searcher, req)
    opt_searcher._plan_cache.clear()
    assert fast == general
    assert len(fast) > 0


def test_negation_mixed_key_stays_on_general_path(opt_searcher):
    """'rust -rust' (a key positive AND negative) must be ineligible
    for the split — and must return no rows (every match excluded)."""
    from searchlite_spark.query import plan as P
    from searchlite_spark.query.planner import build_query_plan

    plan, builder = build_query_plan({"query": "rust -rust"}, opt_searcher.schema)
    m = plan.matcher
    assert isinstance(m, P.QueryStringMatcher) and m.not_term_groups
    assert _rows(opt_searcher, {"query": "rust -rust"}) == []


def test_fused_phrase_matches_ground_truth(opt_searcher):
    """Zero-slop fused phrase aggregation must return exactly the docs
    whose (single-space-joined) body contains the tokens adjacently."""
    fused = _rows(opt_searcher, {"query": '"rust search"', "limit": 400})
    docs = {
        r["doc_id"]: r["body"] for r in opt_searcher.docstore.collect()
    }
    expected = sorted(
        did for did, body in docs.items() if " rust search " in f" {body} "
    )
    assert sorted(d for d, _ in fused) == expected
    assert len(fused) > 0


def test_conjunctive_bitmask_matches_count_distinct(opt_searcher):
    """bool-must conjunction via bit_or mask == count_distinct fallback
    (forced by shrinking the literal threshold via the gid bound)."""
    req = {
        "query": {"type": "bool", "must": [
            {"type": "term", "field": "body", "value": "rust"},
            {"type": "term", "field": "body", "value": "engine"},
        ]},
        "limit": 400,
    }
    via_mask = _rows(opt_searcher, req)
    opt_searcher._plan_cache.clear()
    import searchlite_spark.query.engine as E

    orig = E.Searcher._max_group_id
    try:
        # force the count_distinct fallback branch
        E.Searcher._max_group_id = staticmethod(lambda plan: 64)
        via_count = _rows(opt_searcher, req)
    finally:
        E.Searcher._max_group_id = orig
        opt_searcher._plan_cache.clear()
    assert via_mask == via_count
    assert len(via_mask) > 0


def test_key_info_literal_matches_broadcast_join(opt_searcher):
    """Literal CASE key info == broadcast-join key info (forced by
    zeroing the work bound)."""
    import searchlite_spark.query.engine as E

    req = {"query": "rust fast engine", "limit": 400}
    literal = _rows(opt_searcher, req)
    opt_searcher._plan_cache.clear()
    orig = E.Searcher._KEY_LITERAL_WORK_MAX
    try:
        E.Searcher._KEY_LITERAL_WORK_MAX = 0  # always join
        joined = _rows(opt_searcher, req)
    finally:
        E.Searcher._KEY_LITERAL_WORK_MAX = orig
        opt_searcher._plan_cache.clear()
    assert literal == joined
    assert len(literal) > 0


def test_local_df_value_fidelity(spark):
    from searchlite_spark.localrel import local_df

    df = local_df(
        spark,
        [("a:b", [1, 2], None, None, "f", 10), ("c", [], 2.5, 3, "g", 0)],
        "term STRING, groups ARRAY<INT>, weight DOUBLE, leaf INT, field STRING, df_key LONG",
    )
    assert "LocalRelation" in df._jdf.queryExecution().optimizedPlan().toString()
    rows = sorted(df.collect(), key=lambda r: r["term"])
    assert rows[0].asDict() == {
        "term": "a:b", "groups": [1, 2], "weight": None, "leaf": None,
        "field": "f", "df_key": 10,
    }
    assert rows[1].asDict() == {
        "term": "c", "groups": [], "weight": 2.5, "leaf": 3,
        "field": "g", "df_key": 0,
    }
    # empty literal folds to an empty relation, no RDD job
    e = local_df(spark, [], "doc_id LONG, score DOUBLE")
    assert e.collect() == []
    assert [f.name for f in e.schema.fields] == ["doc_id", "score"]


def test_adaptive_layout_writes_few_files(spark, tmp_path):
    """Unpinned num_partitions must not explode a tiny index into
    core-count files per table (the r6 32x ~300 KB anti-pattern)."""
    from searchlite_spark.index import IndexSchema, TextField, build_index

    rows = [(i, f"alpha beta gamma doc{i % 7}") for i in range(500)]
    corpus = spark.createDataFrame(rows, "doc_id LONG, body STRING")
    schema = IndexSchema(doc_id_field="doc_id", text_fields=(TextField("body"),))
    out = str(tmp_path / "adaptive_idx")
    build_index(spark, corpus, schema, out, id_mode="column")
    for table in ("postings", "docs", "terms"):
        n = len(glob.glob(os.path.join(out, table, "part-*")))
        assert 1 <= n <= 4, (table, n)
