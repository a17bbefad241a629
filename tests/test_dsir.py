"""DSIR importance resampling (Xie et al. 2023): offline replay of the
hashed-gram weights, determinism across partitionings, the neutral
target == corpus case, and selection shifting toward target-like docs.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from searchlite_spark.textops import dsir_select, dsir_weights

B = 64  # small bucket count so collisions actually happen in the test
A = 1.0


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % B


def _grams(text: str) -> list[str]:
    toks = [t for t in text.split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _offline_weights(corpus, target):
    """corpus/target: list[(id, text)] -> {id: logw} with the exact
    expression composition the operator documents."""
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for _, t in corpus:
        for g in _grams(t):
            cr[_bucket(g)] = cr.get(_bucket(g), 0) + 1
    for _, t in target:
        for g in _grams(t):
            ct[_bucket(g)] = ct.get(_bucket(g), 0) + 1
    tr = float(sum(cr.values()))
    tt = float(sum(ct.values()))
    lr = {
        b: (math.log(ct.get(b, 0) + A) - math.log(tt + A * B))
        - (math.log(cr.get(b, 0) + A) - math.log(tr + A * B))
        for b in range(B)
    }
    out = {}
    for i, t in corpus:
        per: dict[int, int] = {}
        for g in _grams(t):
            per[_bucket(g)] = per.get(_bucket(g), 0) + 1
        out[i] = sum(n * lr[b] for b, n in per.items())
    return out


CORPUS = [
    (0, "spark rows fast scan"),
    (1, "merge sort join hash hash"),
    (2, "spark spark window agg"),
    (3, ""),
    (4, "wiki facts wiki facts table"),
    (5, "wiki entry facts figure"),
]
TARGET = [
    (10, "wiki facts figure entry"),
    (11, "wiki facts table entry"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id LONG, text STRING")


def test_weights_match_offline_replay(spark, corpus, target):
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(corpus, target, buckets=B).collect()
    }
    want = _offline_weights(CORPUS, TARGET)
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-9), i


def test_empty_doc_weight_zero_and_eligible(spark, corpus, target):
    got = {r["doc_id"]: r["logw"] for r in
           dsir_weights(corpus, target, buckets=B).collect()}
    assert got[3] == 0.0
    sel = dsir_select(corpus, target, n=6, buckets=B).collect()
    assert {r["doc_id"] for r in sel} == {0, 1, 2, 3, 4, 5}


def test_partitioning_invariance(spark, corpus, target):
    a = dsir_select(corpus, target, n=3, buckets=B).collect()
    b = dsir_select(
        corpus.repartition(7), target.repartition(3), n=3, buckets=B
    ).collect()
    assert [(r["doc_id"], r["key"]) for r in a] == [
        (r["doc_id"], r["key"]) for r in b
    ]


def test_target_like_docs_weigh_more(spark, corpus, target):
    got = {r["doc_id"]: r["logw"] for r in
           dsir_weights(corpus, target, buckets=B).collect()}
    wiki = min(got[4], got[5])
    nonwiki = max(got[0], got[1], got[2])
    assert wiki > nonwiki


def test_neutral_target_is_pure_gumbel(spark, corpus):
    """target == corpus -> every bucket ratio is exactly 0, so the
    selection order is the Gumbel draw alone (replayed offline)."""
    w = {r["doc_id"]: r["logw"] for r in
         dsir_weights(corpus, corpus, buckets=B).collect()}
    assert all(v == 0.0 for v in w.values())

    def gumbel(i):
        h = int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        return -math.log(-math.log(u))

    want = sorted(
        (i for i, _ in CORPUS),
        key=lambda i: (-round(gumbel(i), 4), i),
    )[:4]
    sel = [r["doc_id"] for r in
           dsir_select(corpus, corpus, n=4, buckets=B).collect()]
    assert sel == want


def test_validation(spark, corpus, target):
    with pytest.raises(ValueError):
        dsir_weights(corpus, target, buckets=0).collect()
    with pytest.raises(ValueError):
        dsir_weights(corpus, target, smoothing=0.0).collect()
