"""Opaque tamper-rejecting pagination cursors (reader.rs:55, 614-901):
wire-format round-trips, every validation error the reference raises
(length, hex, version, generation, plan_hash, 50k depth cap), and
engine page walks driven purely by the opaque `next_cursor`."""

from __future__ import annotations

import pytest

from searchlite_spark.query.cursor import (
    CURSOR_HEX_LEN,
    MAX_CURSOR_ADVANCE,
    CursorError,
    F32Score,
    decode_cursor,
    encode_cursor,
)

SCORE = [("_score", "desc")]


# ---- pure wire-format unit tests (no Spark) -----------------------------


def test_score_cursor_roundtrip_is_21_byte_hex():
    c = encode_cursor("build-abc", 10, [3.25], 42, SCORE, True)
    assert len(c) == CURSOR_HEX_LEN == 42
    assert c.startswith("01")  # version byte, reader.rs:614
    values, doc_id, returned = decode_cursor(c, "build-abc", SCORE)
    assert values == [3.25] and doc_id == 42 and returned == 10
    assert isinstance(values[0], F32Score)


def test_sort_cursor_roundtrip_typed_values():
    specs = [("n_chars", "desc"), ("lang", "asc"), ("boost", "asc"),
             ("_score", "desc")]
    c = encode_cursor("g", 20, [123, "en", 1.5, 2.75], 7, specs, False)
    values, doc_id, returned = decode_cursor(c, "g", specs)
    assert values == [123, "en", 1.5, 2.75] and doc_id == 7 and returned == 20
    assert isinstance(values[3], F32Score) and not isinstance(
        values[2], F32Score
    )


def test_missing_value_roundtrip():
    specs = [("a", "asc"), ("b", "desc")]
    c = encode_cursor("g", 0, [None, "x"], 1, specs, False)
    assert decode_cursor(c, "g", specs)[0] == [None, "x"]


def test_huge_doc_id_falls_back_to_sort_state():
    # the 21-byte format carries u32 doc ids (reference segments are
    # u32); larger ids transparently use the JSON state
    c = encode_cursor("g", 0, [1.0], 2**40, SCORE, True)
    assert len(c) != CURSOR_HEX_LEN
    values, doc_id, _ = decode_cursor(c, "g", SCORE)
    assert doc_id == 2**40 and isinstance(values[0], F32Score)


@pytest.mark.parametrize(
    "mutate,frag",
    [
        (lambda c: c[:-2], "parsing sort cursor payload"),  # 40 chars -> JSON branch, not JSON
        (lambda c: c[:-1], "even-length hex"),
        (lambda c: "zz" + c[2:], "non-hex"),
        (lambda c: "ff" + c[2:], "unsupported cursor version"),
    ],
)
def test_score_cursor_structural_tamper_rejected(mutate, frag):
    c = encode_cursor("g", 5, [1.0], 3, SCORE, True)
    with pytest.raises(CursorError, match=frag):
        decode_cursor(mutate(c), "g", SCORE)


def test_stale_generation_rejected_both_formats():
    c = encode_cursor("gen-a", 5, [1.0], 3, SCORE, True)
    with pytest.raises(CursorError, match="stale cursor"):
        decode_cursor(c, "gen-b", SCORE)
    specs = [("a", "asc")]
    c2 = encode_cursor("gen-a", 5, [5], 3, specs, False)
    with pytest.raises(CursorError, match="stale cursor"):
        decode_cursor(c2, "gen-b", specs)


def test_sort_plan_mismatch_rejected_both_formats():
    c = encode_cursor("g", 5, [1.0], 3, SCORE, True)
    with pytest.raises(CursorError, match="sort order does not match"):
        decode_cursor(c, "g", [("rank", "asc")])
    specs = [("a", "asc")]
    c2 = encode_cursor("g", 5, [5], 3, specs, False)
    with pytest.raises(CursorError, match="sort order does not match"):
        decode_cursor(c2, "g", [("a", "desc")])


def test_depth_cap_50k_both_formats():
    deep = encode_cursor("g", MAX_CURSOR_ADVANCE + 1, [1.0], 3, SCORE, True)
    with pytest.raises(CursorError, match="exceeds max supported 50000"):
        decode_cursor(deep, "g", SCORE)
    specs = [("a", "asc")]
    deep2 = encode_cursor("g", MAX_CURSOR_ADVANCE + 1, [5], 3, specs, False)
    with pytest.raises(CursorError, match="exceeds max supported 50000"):
        decode_cursor(deep2, "g", specs)
    # exactly at the cap is fine (reference: strict >)
    ok = encode_cursor("g", MAX_CURSOR_ADVANCE, [1.0], 3, SCORE, True)
    assert decode_cursor(ok, "g", SCORE)[2] == MAX_CURSOR_ADVANCE


# ---- engine integration --------------------------------------------------


@pytest.fixture(scope="module")
def cursor_index(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema,
        KeywordField,
        NumericField,
        TextField,
        build_index,
    )
    from searchlite_spark.query import Searcher

    rows = [
        (i,
         "alpha " * (1 + i % 5) + f"beta doc{i} gamma",
         "en" if i % 2 else "de",
         (i * 37) % 11)
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
    out = str(tmp_path_factory.mktemp("cursor_index"))
    return Searcher(build_index(spark, corpus, schema, out,
                                num_partitions=2, id_mode="column"))


def test_opaque_score_cursor_page_walk(cursor_index):
    """Relevance-sorted walk driven purely by the opaque next_cursor
    equals the one-shot top-30 exactly (ids AND scores): the f32 wire
    round-trip plus f32-space resume comparison loses no boundary row.
    Varying tf (1-5 'alpha's) gives real score ties broken by doc_id."""
    s = cursor_index
    one_shot = [(h["doc_id"], round(h["score"], 5))
                for h in s.search({"query": "alpha", "limit": 30})["hits"]]
    walked, cur = [], None
    for _ in range(3):
        req = {"query": "alpha", "limit": 10}
        if cur:
            req["cursor"] = cur
        resp = s.search(req)
        assert len(resp["next_cursor"]) == CURSOR_HEX_LEN  # fast path
        walked += [(h["doc_id"], round(h["score"], 5)) for h in resp["hits"]]
        cur = resp["next_cursor"]
    assert walked == one_shot


def test_opaque_sort_cursor_page_walk(cursor_index):
    s = cursor_index
    base = {"query": "alpha",
            "sort": [{"field": "rank", "order": "desc"}]}
    one_shot = [h["doc_id"]
                for h in s.search(dict(base, limit=40))["hits"]]
    walked, cur = [], None
    for _ in range(3):
        req = dict(base, limit=15)
        if cur:
            req["cursor"] = cur
        resp = s.search(req)
        walked += [h["doc_id"] for h in resp["hits"]]
        cur = resp.get("next_cursor")
        if cur is None:
            break
        assert len(cur) != CURSOR_HEX_LEN  # sort-state format
    assert walked == one_shot


def test_opaque_cursor_returned_accumulates(cursor_index):
    s = cursor_index
    r1 = s.search({"query": "alpha", "limit": 10})
    _, _, ret1 = decode_cursor(r1["next_cursor"], s.generation, SCORE)
    assert ret1 == 10
    r2 = s.search({"query": "alpha", "limit": 10,
                   "cursor": r1["next_cursor"]})
    _, _, ret2 = decode_cursor(r2["next_cursor"], s.generation, SCORE)
    assert ret2 == 20


def test_opaque_cursor_wrong_sort_and_generation_rejected(cursor_index):
    s = cursor_index
    cur = s.search({"query": "alpha", "limit": 10})["next_cursor"]
    with pytest.raises(CursorError, match="sort order does not match"):
        s.search({"query": "alpha", "limit": 10, "cursor": cur,
                  "sort": [{"field": "rank", "order": "desc"}]})
    fake_gen = encode_cursor("not-this-build", 10, [1.0], 5, SCORE, True)
    with pytest.raises(CursorError, match="stale cursor"):
        s.search({"query": "alpha", "limit": 10, "cursor": fake_gen})


def test_opaque_cursor_depth_cap_on_request(cursor_index):
    s = cursor_index
    deep = encode_cursor(s.generation, MAX_CURSOR_ADVANCE + 1, [1.0], 5,
                         SCORE, True)
    with pytest.raises(CursorError, match="exceeds max supported 50000"):
        s.search({"query": "alpha", "limit": 10, "cursor": deep})


def test_score_cursor_rejected_for_score_asc_sort():
    """The 21-byte format is minted only for the default relevance sort
    (score DESC); replaying it under _score ASC must be rejected — the
    field list matches but the boundary comparison direction does not."""
    c = encode_cursor("g", 10, [3.25], 42, SCORE, True)
    with pytest.raises(CursorError, match="sort order does not match"):
        decode_cursor(c, "g", [("_score", "asc")])
