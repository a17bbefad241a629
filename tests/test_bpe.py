"""BPE tokenizer: the incremental trainer against an independent naive
reimplementation, hand-derived merges on the classic example,
train/encode consistency, the roundtrip + fixpoint invariants the
driver oracle replays, partition invariance, and the truncation warn.
"""

from __future__ import annotations

import warnings
from collections import Counter

import pytest

from searchlite_spark.textops.bpe import (
    END,
    bpe_encode,
    bpe_train,
    encode_word,
    learn_merges,
    word_counts,
)


def _naive_learn(counts, num_merges, min_pair_count=2):
    """Independent trainer: full pair recount every iteration."""
    words = {i: (list(w) + [END], c) for i, (w, c) in enumerate(counts) if w}
    merges = []
    while len(merges) < num_merges:
        pc: Counter = Counter()
        for syms, c in words.values():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        mx = max(pc.values())
        if mx < min_pair_count:
            break
        best = min(p for p, c in pc.items() if c == mx)
        merges.append(best)
        for i, (syms, c) in words.items():
            out, j = [], 0
            while j < len(syms):
                if (
                    j < len(syms) - 1
                    and (syms[j], syms[j + 1]) == best
                ):
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, c)
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_incremental_trainer_matches_naive():
    for counts in (
        SENNRICH,
        [("aaa", 3), ("aab", 2), ("ba", 4)],
        [("abcabc", 2), ("bcab", 5), ("cab", 1)],
    ):
        for n in (1, 3, 8, 50):
            assert learn_merges(counts, n, min_pair_count=1) == _naive_learn(
                counts, n, 1
            ), (counts, n)


def test_sennrich_first_merges():
    m = learn_merges(SENNRICH, 4)
    # est</w> wins via e+s (9: newest 6 + widest 3), then es+t</w> ...
    assert m[0] == ("e", "s")
    assert m[1] == ("es", "t")
    assert m[2] == ("est", END)
    # next: 'l','o' in low(5)+lower(2) = 7
    assert m[3] == ("l", "o")


def test_encode_reproduces_training_tokenization():
    m = learn_merges(SENNRICH, 10, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(m)}
    # replay independently: apply merges in rank order to each word
    for w, _ in SENNRICH:
        syms = list(w) + [END]
        for pair in m:
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == pair:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        assert encode_word(w, ranks) == syms, w


def test_overlapping_pair_left_to_right():
    # 'aaaa' with merge (a,a): pairs replace left-to-right -> aa aa
    assert encode_word("aaa", {("a", "a"): 0}) == ["aa", "a", END]
    assert encode_word("aaaa", {("a", "a"): 0, ("aa", "aa"): 1}) == [
        "aaaa", END
    ]


def test_distributed_encode_invariants(spark):
    docs = spark.createDataFrame(
        [
            (0, "low low lower newest"),
            (1, "widest newest newest low"),
            (2, ""),
            (3, "unseen zap"),
        ],
        "doc_id LONG, text STRING",
    )
    merges = bpe_train(docs, num_merges=6, min_pair_count=1)
    out = bpe_encode(docs, merges).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 4
    assert by_id[2]["tokens"] == [] and by_id[2]["n_tokens"] == 0
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    rule_set = {tuple(p) for p in merges}
    for r in out:
        toks = r["tokens"]
        assert r["n_tokens"] == len(toks)
        # roundtrip: concatenation reproduces words + END markers
        src = {d["doc_id"]: d["text"] for d in docs.collect()}
        words = [w for w in src[r["doc_id"]].split() if w]
        assert "".join(toks) == "".join(w + END for w in words)
        # fixpoint: no adjacent pair is a merge rule
        for a, b in zip(toks, toks[1:]):
            assert (a, b) not in rule_set, (a, b)


def test_encode_partition_invariance(spark):
    rows = [(i, "spark rows fast scan merge sort " * 3) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    merges = bpe_train(docs, num_merges=12, min_pair_count=1)
    a = sorted(
        (r["doc_id"], tuple(r["tokens"]))
        for r in bpe_encode(docs, merges).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["tokens"]))
        for r in bpe_encode(docs.repartition(11), merges).collect()
    )
    assert a == b


def test_word_counts_order_and_truncation_warn(spark):
    docs = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a d")], "doc_id LONG, text STRING"
    )
    wc = word_counts(docs)
    assert wc[:2] == [("a", 3), ("b", 3)]  # count desc, word asc
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        short = word_counts(docs, max_words=2)
        assert any("truncated" in str(x.message) for x in w)
    assert short == [("a", 3), ("b", 3)]


def test_min_pair_count_stops_memorization():
    # every pair occurs once -> no merges at the default threshold
    assert learn_merges([("abc", 1), ("def", 1)], 10) == []
