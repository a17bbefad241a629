"""Filtered, multi-clause hybrid retrieval (hybrid_multi_topk):
reference parity with reader.rs build_vector_plan (clause validation,
alpha/boost rules), collect_vector_maps (root+vector filters applied
BEFORE per-clause truncation), compute_hybrid_score (per-clause blend,
missing sentinels, mean over clauses) and merge_vector_hits (vector-only
drops docs with no vector score)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from searchlite_spark.query import Searcher
from searchlite_spark.textops import cosine_topk, hybrid_multi_topk


@pytest.fixture(scope="module")
def searcher(tiny_index):
    return Searcher(tiny_index)


@pytest.fixture(scope="module")
def emb(spark, searcher):
    # one unit-ish vector per doc of the tiny corpus, ids = doc_ids
    ids = sorted(
        r["doc_id"] for r in searcher.docs.select("doc_id").collect()
    )
    vecs = {
        ids[0]: [1.0, 0.0, 0.0, 0.0],
        ids[1]: [0.8, 0.6, 0.0, 0.0],
        ids[2]: [0.0, 0.0, 1.0, 0.0],
    }
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )


def _offline_expected(searcher, emb_rows, clauses, query, k, bm_scores):
    """Driver-side model of compute_hybrid_score over the tiny corpus."""

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    cand_ids = set(bm_scores)
    per_clause = []
    for c in clauses:
        scores = {
            i: cos(v, c["vector"]) * c.get("boost", 1.0)
            for i, v in emb_rows.items()
        }
        per_clause.append(scores)
        cand_ids |= set(scores)
    out = []
    for i in sorted(cand_ids):
        bm = bm_scores.get(i, 0.0)
        s = 0.0
        for c, scores in zip(clauses, per_clause):
            a = c.get("alpha", 0.5)
            vec = scores.get(i, -1.0)
            if a >= 1.0:
                s += bm
            elif a <= 0.0:
                s += vec
            else:
                s += a * bm + (1 - a) * vec
        out.append((i, s / len(clauses)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_multi_clause_mean_blend_matches_model(searcher, emb):
    emb_rows = {
        r["vec_id"]: list(r["embedding"]) for r in emb.collect()
    }
    clauses = [
        {"vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.5},
        {"vector": [0.0, 0.0, 1.0, 0.0], "alpha": 0.3, "boost": 2.0},
    ]
    bm = {
        r["doc_id"]: r["score"]
        for r in searcher.match_set({"query": "rust"}).collect()
    }
    got = [
        (r["doc_id"], r["score"])
        for r in hybrid_multi_topk(
            searcher, emb, clauses, query="rust", k=3
        ).collect()
    ]
    want = _offline_expected(searcher, emb_rows, clauses, "rust", 3, bm)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_vector_only_drops_docs_without_vector_score(searcher, emb):
    # one clause, alpha=0 (pure vector), tiny candidate_k=2: only the 2
    # nearest vectors may appear — no bm25-only doc sneaks in, and the
    # missing-vector doc is dropped (merge_vector_hits all_vector_only)
    out = hybrid_multi_topk(
        searcher,
        emb,
        [{"vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.0}],
        query="rust",
        k=10,
        candidate_k=2,
    ).collect()
    assert len(out) == 2
    exact = cosine_topk(emb, [1.0, 0.0, 0.0, 0.0], 2).collect()
    assert [r["doc_id"] for r in out] == [r["vec_id"] for r in exact]


def test_vector_filter_applies_before_truncation(searcher, emb):
    # filter to lang=de (doc3); with candidate_k=1 an unfiltered top-1
    # would pick the 1.0-cosine doc1 and the filter would then leave
    # NOTHING — filter-then-truncate must instead return doc3
    de_id = searcher.docs.where(F.lower("lang") == "de").collect()[0][
        "doc_id"
    ]
    out = hybrid_multi_topk(
        searcher,
        emb,
        [{"vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.0}],
        k=5,
        candidate_k=1,
        vector_filter=[{"KeywordEq": {"field": "lang", "value": "de"}}],
    ).collect()
    assert [r["doc_id"] for r in out] == [de_id]


def test_doc_filter_constrains_both_legs(searcher, emb):
    # root filter lang=en: the de doc must appear in NEITHER leg even
    # though it BM25-matches "rust" and has a vector
    de_id = searcher.docs.where(F.lower("lang") == "de").collect()[0][
        "doc_id"
    ]
    out = hybrid_multi_topk(
        searcher,
        emb,
        [{"vector": [0.0, 0.0, 1.0, 0.0], "alpha": 0.5}],
        query="rust",
        k=10,
        doc_filter=[{"KeywordEq": {"field": "lang", "value": "en"}}],
    ).collect()
    assert de_id not in {r["doc_id"] for r in out}
    assert len(out) > 0


def test_zero_boost_candidates_by_id_and_score_zero(searcher, emb):
    out = hybrid_multi_topk(
        searcher,
        emb,
        [{"vector": [1.0, 0.0, 0.0, 0.0], "alpha": 0.0, "boost": 0.0}],
        k=10,
        candidate_k=2,
    ).collect()
    ids = sorted(r["vec_id"] for r in emb.collect())[:2]
    assert sorted(r["doc_id"] for r in out) == ids
    assert all(r["score"] == 0.0 for r in out)


def test_clause_validation_matches_reference():
    with pytest.raises(ValueError, match="at least one"):
        hybrid_multi_topk(None, None, [])
    with pytest.raises(ValueError, match="too many vector clauses"):
        hybrid_multi_topk(
            None, None, [{"vector": [1.0], "alpha": 0.5}] * 9
        )
    with pytest.raises(ValueError, match="alpha"):
        hybrid_multi_topk(None, None, [{"vector": [1.0], "alpha": 1.5}])
    with pytest.raises(ValueError, match="alpha"):
        hybrid_multi_topk(
            None, None, [{"vector": [1.0], "alpha": float("nan")}]
        )
    with pytest.raises(ValueError, match="boost"):
        hybrid_multi_topk(
            None, None, [{"vector": [1.0], "boost": -1.0}]
        )
