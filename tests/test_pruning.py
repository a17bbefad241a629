"""Pruning equivalence property (reference tests/pruning.rs:44-104):
brute-force BM25, WAND and BMW return the same top-k ids and scores
(±1e-5) on a randomized seeded corpus."""

import random

import pytest


VOCAB = [
    "rust", "search", "engine", "fast", "tiny", "wand", "bmw",
    "sqlite", "index", "language", "systems", "programming",
]


@pytest.fixture(scope="module")
def rand_index(spark, tmp_path_factory):
    from searchlite_spark.index import IndexSchema, TextField, build_index

    rng = random.Random(42)
    rows = []
    for i in range(400):
        n = rng.randint(5, 14)
        # zipf-ish skew so head terms exist
        words = [VOCAB[min(int(rng.expovariate(0.35)), len(VOCAB) - 1)] for _ in range(n)]
        rows.append((i, " ".join(words)))
    corpus = spark.createDataFrame(rows, "doc_id LONG, body STRING")
    schema = IndexSchema(doc_id_field="doc_id", text_fields=(TextField("body"),))
    out = str(tmp_path_factory.mktemp("rand_index"))
    # small blocks so multi-block pruning paths are exercised
    return build_index(
        spark, corpus, schema, out, num_partitions=4, block_size=16,
        id_mode="column",
    )


@pytest.fixture(scope="module")
def rand_searcher(rand_index):
    from searchlite_spark.query import Searcher

    return Searcher(rand_index)


def _collect(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_wand_bmw_equal_kernel_brute(rand_searcher):
    """The reference invariant (pruning.rs:44-104): pruned executions
    return identical ids + scores to the unpruned scorer.  All kernel
    modes share one arithmetic, so equality is exact."""
    from searchlite_spark.query.wand import wand_topk

    rng = random.Random(7)
    queries = [
        " ".join(rng.sample(VOCAB, rng.randint(1, 3))) for _ in range(5)
    ]
    s = rand_searcher
    for q in queries:
        results = {}
        for mode in ("brute", "wand", "bmw"):
            df = s._try_wand({"query": q, "limit": 10, "execution": "bmw"}, 10, mode)
            assert df is not None, q
            results[mode] = _collect(df)
        brute, wand, bmw = results["brute"], results["wand"], results["bmw"]
        assert len(brute) == len(wand) == len(bmw) == 10, q
        for (bd, bs), (wd, ws), (md, ms) in zip(brute, wand, bmw):
            assert bd == wd == md, f"ids differ for {q!r}: {brute} {wand} {bmw}"
            assert abs(bs - ws) < 1e-5, q
            assert abs(bs - ms) < 1e-5, q


def test_kernel_matches_spark_brute(rand_searcher):
    """Kernel vs the DataFrame brute scorer: same doc sets and scores
    within fp tolerance; ties (equal rounded scores) may permute."""
    rng = random.Random(13)
    queries = [" ".join(rng.sample(VOCAB, rng.randint(1, 3))) for _ in range(4)]
    for q in queries:
        base = {"query": q, "limit": 10}
        brute = _collect(rand_searcher.topk({**base, "execution": "bm25"}))
        bmw = _collect(rand_searcher.topk({**base, "execution": "bmw"}))
        assert len(brute) == len(bmw), q
        bg = {round(s, 6) for _, s in brute}
        mg = {round(s, 6) for _, s in bmw}
        assert bg == mg, q
        # id multisets per rounded-score group must agree
        from collections import defaultdict

        b_groups, m_groups = defaultdict(set), defaultdict(set)
        for d, s in brute:
            b_groups[round(s, 6)].add(d)
        for d, s in bmw:
            m_groups[round(s, 6)].add(d)
        # boundary group (lowest score) may legitimately differ only in
        # tie-broken membership; all ids must still be score-ties
        for key in b_groups:
            if key != min(b_groups):
                assert b_groups[key] == m_groups[key], q


def test_wand_routing_fallback(rand_searcher):
    # phrase query is not WAND-eligible -> brute fallback, same API
    res = rand_searcher.topk({"query": '"rust search"', "limit": 5})
    assert res.columns == ["doc_id", "score"]


def test_seeded_threshold_prunes_low_scores(rand_searcher):
    # k smaller than df of all terms => theta > 0 path exercised
    out = _collect(rand_searcher.topk({"query": "rust index", "limit": 3}))
    assert len(out) == 3
    assert out[0][1] >= out[1][1] >= out[2][1]


def test_pack_partition_file_concat_seam():
    """Spark can bin-pack several per-file-sorted parquet files into one
    scan task; a head term that ends one file and starts the next arrives
    as a same-term stream with a doc_id regression.  pack_partition must
    close the run at the seam and emit disjoint ascending blocks, never a
    block with unsorted payload / max_doc_id < block_id."""
    import numpy as np
    import pandas as pd

    from searchlite_spark.index.blocks import pack_partition

    # file A: term "web" docs 100..109; file B: term "web" docs 0..9 then
    # term "zoo" docs 3,4 — concatenated into one batch (worst case)
    def seg(term, docs):
        return pd.DataFrame(
            {"term": term, "doc_id": docs, "tf": 1, "dl": 10}
        )

    batch = pd.concat(
        [seg("web", range(100, 110)), seg("web", range(0, 10)), seg("zoo", [3, 4])],
        ignore_index=True,
    )
    blocks = pd.concat(list(pack_partition(iter([batch]), block_size=4)),
                       ignore_index=True)
    from searchlite_spark.index.codec import decode_deltas

    seen = {}
    for _, row in blocks.iterrows():
        docs = decode_deltas(row["doc_ids"], row["n"])
        assert list(docs) == sorted(docs), "block payload must be ascending"
        assert row["block_id"] == docs[0]
        assert row["max_doc_id"] == docs[-1]
        seen.setdefault(row["term"], []).extend(docs)
    assert sorted(seen["web"]) == list(range(0, 10)) + list(range(100, 110))
    assert sorted(seen["zoo"]) == [3, 4]

    # same seam split across two Arrow batches (run carried between them)
    batches = [seg("web", range(100, 110)), seg("web", range(0, 10))]
    blocks2 = pd.concat(
        list(pack_partition(iter(batches), block_size=4)), ignore_index=True
    )
    got = []
    for _, row in blocks2.iterrows():
        docs = decode_deltas(row["doc_ids"], row["n"])
        assert list(docs) == sorted(docs)
        got.extend(docs)
    assert sorted(got) == list(range(0, 10)) + list(range(100, 110))
