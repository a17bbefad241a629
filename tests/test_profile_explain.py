"""Profile counters + explain payload + cursor staleness.

Reference surface being mirrored:
* profile counters — reader.rs:115-129 (scored_docs,
  candidates_examined, search_ms) and wand.rs:45-50 pruning counters;
* explain payload — tests/function_score.rs:373 asserts per-function
  explanations;
* cursor generation check — reader.rs:821-869 rejects cursors from a
  different index generation.
"""

from __future__ import annotations

import pytest

from searchlite_spark.query import Searcher


@pytest.fixture(scope="module")
def s(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema,
        KeywordField,
        NumericField,
        TextField,
        build_index,
    )

    rows = [
        (i, f"alpha beta doc{i} gamma delta", "en" if i % 2 else "de", i * 3)
        for i in range(30)
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
    out = str(tmp_path_factory.mktemp("profexp_idx"))
    idx = build_index(spark, corpus, schema, out, id_mode="column",
                      num_partitions=2)
    return Searcher(idx)


def test_profile_counters_brute_path(s):
    resp = s.search({"query": "alpha beta", "limit": 5, "profile": True})
    prof = resp["profile"]
    assert prof["returned"] == 5
    assert prof["scored_docs"] == 30  # every doc matches both terms
    # candidates_examined = sum of df over the two query keys
    assert prof["candidates_examined"] == 60
    assert prof["search_ms"] > 0
    assert "pruning" not in prof  # brute path: no kernel counters


def test_profile_pruning_counters_kernel_path(s):
    s.topk({"query": "alpha doc3", "limit": 3, "execution": "bmw"}).collect()
    assert s.last_wand_counters is not None
    counts = {k: int(v.value) for k, v in s.last_wand_counters.items()}
    assert counts["blocks_candidate"] > 0
    assert counts["blocks_decoded"] >= 0
    assert counts["docs_scored"] > 0


def test_explain_function_score(s):
    req = {
        "query": {
            "type": "function_score",
            "query": {"type": "term", "field": "body", "value": "alpha"},
            "functions": [
                {"type": "field_value_factor", "field": "rank",
                 "factor": 0.5, "modifier": "log1p"},
                {"type": "weight", "weight": 2.0,
                 "filter": {"KeywordEq": {"field": "lang", "value": "en"}}},
            ],
            "score_mode": "sum",
            "boost_mode": "multiply",
        },
        "limit": 4,
        "explain": True,
    }
    resp = s.search(req)
    for h in resp["hits"]:
        expl = h["explanation"]
        # HitExplanation wire shape (reader.rs:90-97)
        assert expl["final_score"] == h["score"]
        # base = the term query's BM25 score, before functions
        assert 0.0 < expl["base_score"] != expl["final_score"]
        kinds = [f["type"] for f in expl["functions"]]
        # fvf applies to every doc; the weight function only where its
        # lang=en filter matches (tests/function_score.rs:189-226:
        # inactive functions are OMITTED, not null-valued)
        assert kinds[0] == "field_value_factor"
        assert expl["functions"][0]["field"] == "rank"
        assert expl["functions"][0]["value"] >= 0.0
        if h["fields"]["lang"] == "en":
            assert kinds == ["field_value_factor", "weight"]
        else:
            assert kinds == ["field_value_factor"]
        assert "rescore" not in expl


def test_explain_plain_query(s):
    resp = s.search({"query": "alpha", "limit": 2, "explain": True})
    for h in resp["hits"]:
        expl = h["explanation"]
        assert expl["final_score"] == h["score"]
        assert expl["base_score"] == h["score"]
        assert "functions" not in expl  # empty => omitted (serde skip)
        assert "rescore" not in expl


def test_explain_rescore_breakdown(s):
    """Window hits matching the rescore query carry a RescoreExplanation
    (reader.rs:3364-3382): rescore_score + combined_score; hits outside
    the window (or not matching) have none."""
    req = {
        "query": "alpha",
        "rescore": {
            "query": "doc3 doc5",
            "window_size": 4,
            "score_mode": "total",
        },
        "limit": 10,
        "explain": True,
    }
    resp = s.search(req)
    with_resc = [
        h for h in resp["hits"] if "rescore" in h["explanation"]
    ]
    # exactly the window hits that matched doc3/doc5
    assert {h["doc_id"] for h in with_resc} <= {3, 5}
    assert len(with_resc) >= 1
    for h in with_resc:
        expl = h["explanation"]
        r = expl["rescore"]
        assert r["combined_score"] == h["score"]
        # total mode: combined = base + rescore
        assert abs(
            (expl["base_score"] + r["rescore_score"]) - h["score"]
        ) < 1e-5
    for h in resp["hits"]:
        assert "_rescore_win" not in h  # internal flag never leaks
        if "rescore" not in h["explanation"]:
            assert h["explanation"]["base_score"] == h["score"]


def test_cursor_generation_accepted_and_stale_rejected(s, spark, tmp_path_factory):
    req = {"query": "alpha", "sort": [{"field": "rank", "order": "desc"}],
           "limit": 5}
    page1 = s.search(req)
    cur = page1["cursor"]
    assert cur["generation"] == s.generation
    assert cur["values"] == page1["next_search_after"]
    # same generation: accepted
    page2 = s.search(dict(req, search_after=cur))
    assert not (
        {h["doc_id"] for h in page1["hits"]}
        & {h["doc_id"] for h in page2["hits"]}
    )
    # different generation (rebuilt index): rejected
    stale = dict(cur, generation="2000-01-01T00:00:00Z/999")
    with pytest.raises(ValueError, match="stale cursor"):
        s.search(dict(req, search_after=stale))


def test_cursor_pagination_slim_docstore(spark, tmp_path_factory):
    """ADVICE round 2: the cursor must carry COMPUTED sort keys (_sk_i
    columns threaded through _apply_sort), not values re-read from the
    docstore row.  Paginate exhaustively over a slim docstore
    (store_columns) and assert no page is dropped and no cursor value
    is ever None."""
    from searchlite_spark.index import (
        IndexSchema, NumericField, TextField, build_index,
    )

    rows = [(i, "common text alpha", (i * 7) % 13) for i in range(20)]
    corpus = spark.createDataFrame(rows, "doc_id LONG, body STRING, rank LONG")
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        numeric_fields=(NumericField("rank"),),
    )
    out = str(tmp_path_factory.mktemp("unstored_sort"))
    idx = build_index(
        spark, corpus, schema, out, id_mode="column", num_partitions=2,
        store_columns=["rank"],  # rank IS stored; body is not — and we
        # also verify cursors when sorting by rank with body unstored
    )
    s2 = Searcher(idx)
    req = {"query": "alpha", "sort": [{"field": "rank"}], "limit": 4}
    seen: list[int] = []
    cursor = None
    for _ in range(6):
        r = dict(req)
        if cursor is not None:
            r["search_after"] = cursor
        resp = s2.search(r)
        if not resp["hits"]:
            break
        for h in resp["hits"]:
            assert h["doc_id"] not in seen
            seen.append(h["doc_id"])
        cursor = resp["next_search_after"]
        assert cursor[0] is not None  # computed sort key, never None
    assert len(seen) == 20
