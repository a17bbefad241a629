"""PMI collocations: hand-computed counts/PMI on a tiny corpus,
min_count noise gate, deterministic rank order, partition invariance."""

from __future__ import annotations

import math

from searchlite_spark.textops import collocations_pmi


def _df(spark, texts, n_parts=1):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    ).repartition(n_parts)


def test_pmi_hand_computed(spark):
    # unigrams: a=3 b=3 c=1 (Nt=7); bigrams: ab=3 ba=1 bc=1 (Nb=5)
    df = _df(spark, ["a b a b c", "a b"])
    out = collocations_pmi(df, min_count=2, top_k=10).collect()
    assert [(r["w1"], r["w2"], r["c12"]) for r in out] == [("a", "b", 3)]
    expect = round(math.log((3 / 5) / ((3 / 7) * (3 / 7))), 4)
    assert out[0]["pmi_r"] == expect


def test_min_count_gates_noise(spark):
    df = _df(spark, ["x y", "p q p q"])
    # bigrams: xy=1, pq=2, qp=1
    got = {(r["w1"], r["w2"]) for r in
           collocations_pmi(df, min_count=2, top_k=10).collect()}
    assert got == {("p", "q")}


def test_rank_order_and_tiebreak(spark):
    # two bigrams with identical counts everywhere -> identical PMI;
    # tie must break on (w1, w2) text order
    df = _df(spark, ["m n", "m n", "y z", "y z"])
    out = collocations_pmi(df, min_count=2, top_k=10).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("m", "n"), ("y", "z")]
    assert out[0]["pmi_r"] == out[1]["pmi_r"]


def test_partition_invariance(spark):
    texts = [f"t{i % 5} t{(i + 1) % 5} filler{i % 7}" for i in range(200)]
    a = collocations_pmi(_df(spark, texts, 1), min_count=3, top_k=15).collect()
    b = collocations_pmi(_df(spark, texts, 8), min_count=3, top_k=15).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_unigram_cross_entropy_hand_computed(spark):
    import math

    from searchlite_spark.textops import unigram_cross_entropy

    # corpus: a=3 b=2 c=1, Nt=6
    df = _df(spark, ["a a b", "a b c", ""])
    out = {r["doc_id"]: r for r in unigram_cross_entropy(df).collect()}
    p = {"a": 3 / 6, "b": 2 / 6, "c": 1 / 6}
    ce0 = -(math.log(p["a"]) * 2 + math.log(p["b"])) / 3
    ce1 = -(math.log(p["a"]) + math.log(p["b"]) + math.log(p["c"])) / 3
    assert out[0]["n_tokens"] == 3 and out[0]["ce_r"] == round(ce0, 4)
    assert out[1]["n_tokens"] == 3 and out[1]["ce_r"] == round(ce1, 4)
    # zero-token docs are kept, flagged with NULL ce
    assert out[2]["n_tokens"] == 0 and out[2]["ce_r"] is None
    # the rarer-token doc is more surprising
    assert out[1]["ce_r"] > out[0]["ce_r"]


def test_duplicate_window_stats(spark):
    from searchlite_spark.textops import duplicate_window_stats

    texts = [
        "a b c d e f",        # doc 0: 4 windows, all shared with doc 1
        "a b c d e f",        # doc 1: exact copy
        "p q r s t u v",      # doc 2: unique, 5 windows
        "x y z",              # doc 3: shorter than the window -> 0 windows
        "m n m n m n",        # doc 4: within-doc repeat "m n m" x2
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r for r in
           duplicate_window_stats(df, window=3).collect()}
    assert (out[0]["n_windows"], out[0]["n_dup_windows"]) == (4, 4)
    assert out[0]["dup_frac_r"] == 1.0
    assert (out[1]["n_windows"], out[1]["n_dup_windows"]) == (4, 4)
    assert (out[2]["n_windows"], out[2]["n_dup_windows"]) == (5, 0)
    assert out[2]["dup_frac_r"] == 0.0
    assert (out[3]["n_windows"], out[3]["n_dup_windows"]) == (1, 0)
    # "x y z" has exactly one 3-window; doc 4's "m n m" appears twice
    # (within-document duplication counts) and "n m n" twice
    assert (out[4]["n_windows"], out[4]["n_dup_windows"]) == (4, 4)
    assert out[4]["dup_frac_r"] == 1.0

def test_duplicate_window_stats_hashed_equals_literal(spark):
    """hash_keys=True must reproduce the literal-key output exactly
    (collisions need both independent xxhash64 halves to agree)."""
    from searchlite_spark.textops import duplicate_window_stats

    rows = [(i, f"tok{i % 11} " * 12 + f"tail{i % 5} end") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    lit = sorted(map(tuple, duplicate_window_stats(df, window=4).collect()))
    hsh = sorted(map(tuple, duplicate_window_stats(
        df, window=4, hash_keys=True).collect()))
    assert lit == hsh

def test_bigram_cross_entropy_hand_computed(spark):
    import math

    from searchlite_spark.textops import bigram_cross_entropy

    # corpus tokens: doc0 = a b a b ; doc1 = a b c ; doc2 = ""
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "")],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in
           bigram_cross_entropy(df, interp=0.5).collect()}
    # counts: a=3 b=3 c=1, Nt=7; bigrams: (a,b)=3, (b,a)=1, (b,c)=1
    nt = 7.0
    lam = 0.5

    def p(c12, c1, c2):
        return lam * (c12 / c1) + (1 - lam) * (c2 / nt)

    ce0 = -(
        math.log(3 / nt)            # first 'a' unigram
        + math.log(p(3, 3, 3))      # a->b
        + math.log(p(1, 3, 3))      # b->a
        + math.log(p(3, 3, 3))      # a->b
    ) / 4
    ce1 = -(
        math.log(3 / nt)
        + math.log(p(3, 3, 3))      # a->b
        + math.log(p(1, 3, 1))      # b->c
    ) / 3
    assert out[0]["n_tokens"] == 4 and out[0]["ce_r"] == round(ce0, 4)
    assert out[1]["n_tokens"] == 3 and out[1]["ce_r"] == round(ce1, 4)
    assert out[2]["n_tokens"] == 0 and out[2]["ce_r"] is None


def test_bigram_ce_interp_zero_is_unigram(spark):
    from searchlite_spark.textops import (
        bigram_cross_entropy,
        unigram_cross_entropy,
    )

    df = spark.createDataFrame(
        [(i, f"w{i % 3} x y w{i % 2} z") for i in range(20)],
        "doc_id LONG, text STRING",
    )
    a = sorted(map(tuple, bigram_cross_entropy(df, interp=0.0).collect()))
    b = sorted(map(tuple, unigram_cross_entropy(df).collect()))
    assert a == b


def test_bigram_ce_validation(spark):
    import pytest as _pt

    from searchlite_spark.textops import bigram_cross_entropy

    df = spark.createDataFrame([(0, "a b")], "doc_id LONG, text STRING")
    with _pt.raises(ValueError):
        bigram_cross_entropy(df, interp=1.0)
