"""Byte-pair-encoding tokenizer: distributed training statistics +
distributed encoding (Sennrich et al. 2016, arXiv:1508.07909 — the
standard LLM-tokenizer construction).

The split of work follows how BPE is actually trained on large corpora
(and how the reference tokenizes per-segment, tokenizer.rs): the ONLY
corpus-scale job is a word-frequency aggregate (map-side partial, one
exchange carrying (word, count) pairs); merge learning then runs on the
driver over the bounded word-count table — BPE training state is a
function of word frequencies alone, so a 10^12-doc corpus and its
100k-row frequency table train the identical tokenizer.  Encoding is a
zero-shuffle Arrow kernel with a per-batch word cache (Zipf: most words
repeat, so amortized cost per token is a dict hit).

Conventions (pinned by tests and the driver oracle):
* a word's symbol sequence is its characters plus a separate final
  ``</w>`` marker, so concatenating a word's tokens reproduces
  ``word + '</w>'`` exactly (the roundtrip invariant);
* the next merge is the most frequent adjacent pair, ties broken by
  the lexicographically smallest (left, right) — fully deterministic,
  no RNG, engine-independent;
* both the trainer and the encoder replace ALL occurrences of the
  chosen pair left-to-right, the original eager semantics.
"""

from __future__ import annotations

import heapq
import warnings
from collections import Counter

from pyspark.sql import DataFrame, functions as F

END = "</w>"


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_words: int | None = 100_000,
    min_count: int = 1,
    warn_on_truncate: bool = True,
) -> list[tuple[str, int]]:
    """(word, count) rows for the most frequent whitespace words, most
    frequent first (count desc, word asc — a deterministic order).

    ``max_words`` bounds the driver-side table (TakeOrdered — no full
    sort); at web scale also raise ``min_count`` (typo/noise words are
    a long Zipf tail that cannot affect early merges but would bloat
    the exchange).  Truncation warns: dropped tail words still get
    encoded (BPE falls back to character pieces), but they no longer
    vote on merge frequencies.
    """
    from searchlite_spark.textops.dedup import _tokens

    counts = (
        df.select(F.explode(F.filter(_tokens(F.col(text_col)), lambda x: x != "")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= int(min_count))
    )
    if max_words is None:
        rows = counts.collect()
        rows.sort(key=lambda r: (-r["c"], r["w"]))
        return [(r["w"], int(r["c"])) for r in rows]
    got = (
        counts.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(int(max_words) + 1)
        .collect()
    )
    if len(got) > int(max_words):
        got = got[: int(max_words)]
        if warn_on_truncate:
            warnings.warn(
                f"bpe.word_counts: vocabulary truncated to the top "
                f"{max_words} words (raise max_words/min_count to widen "
                "the merge-statistics base; tail words still encode via "
                "character fallback)",
                RuntimeWarning,
                stacklevel=2,
            )
    return [(r["w"], int(r["c"])) for r in got]


def learn_merges(
    counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Driver-side BPE merge learning over a (word, count) table.

    A lazy max-heap keyed ``(-count, pair)`` pops the most frequent
    pair with the lexicographically-smallest tie-break; stale entries
    are discarded on pop (counts only ever change when a word
    containing the pair is rewritten).  Stops early when the best pair
    falls below ``min_pair_count`` (merging hapax pairs memorizes the
    corpus).  Cost: O(total symbols) per merge in the worst case,
    bounded by the word-table size, independent of corpus size.
    """
    words: list[list[str]] = []
    wcount: list[int] = []
    for w, c in counts:
        if not w:
            continue
        words.append(list(w) + [END])
        wcount.append(int(c))

    def pairs_of(syms):
        return Counter(zip(syms, syms[1:]))

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for p, n in pairs_of(syms).items():
            pair_counts[p] += n * wcount[i]
            pair_words.setdefault(p, set()).add(i)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < int(num_merges) and heap:
        negc, pair = heapq.heappop(heap)
        cur = pair_counts.get(pair, 0)
        if cur != -negc:
            if cur > 0:
                heapq.heappush(heap, (-cur, pair))
            continue
        if cur < int(min_pair_count):
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        touched: Counter = Counter()
        for wi in list(pair_words.get(pair, ())):
            syms = words[wi]
            before = pairs_of(syms)
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            after = pairs_of(out)
            for p in set(before) | set(after):
                d = (after.get(p, 0) - before.get(p, 0)) * wcount[wi]
                if d:
                    touched[p] += d
            for p in before:
                if p not in after:
                    s = pair_words.get(p)
                    if s:
                        s.discard(wi)
            for p in after:
                if p not in before:
                    pair_words.setdefault(p, set()).add(wi)
        for p, d in touched.items():
            nc = pair_counts.get(p, 0) + d
            if nc <= 0:
                pair_counts.pop(p, None)
            else:
                pair_counts[p] = nc
                heapq.heappush(heap, (-nc, p))
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def bpe_train(
    df: DataFrame,
    num_merges: int = 1000,
    text_col: str = "text",
    max_words: int | None = 100_000,
    min_count: int = 1,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """One-call training: corpus word counts (the one distributed job)
    + driver merge learning.  Returns the ordered merge list."""
    return learn_merges(
        word_counts(df, text_col, max_words, min_count),
        num_merges,
        min_pair_count,
    )


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """All symbols the encoder can emit given ``merges``: every merged
    symbol, every proper prefix-piece is NOT included — the open
    character fallback means unseen characters are legal tokens, so
    vocabulary membership checks must treat single characters (and the
    END marker) as implicitly in-vocab.  Returns the merged symbols
    only, deterministically ordered by merge rank."""
    return [a + b for a, b in merges]


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: repeatedly apply the lowest-rank applicable
    merge to ALL its occurrences (left-to-right), until none applies.
    Exactly reproduces the trainer's rewrite sequence on training
    words (pinned by tests)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        out, i = [], 0
        while i < len(syms):
            if (
                i < len(syms) - 1
                and syms[i] == best_pair[0]
                and syms[i + 1] == best_pair[1]
            ):
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed encode: ``(id, tokens ARRAY<STRING>, n_tokens)`` per
    input row (empty/whitespace-only text -> empty tokens).  A
    mapInPandas Arrow kernel — zero shuffle, the text column never
    leaves its partition — with a per-batch word->pieces cache so the
    per-token cost is a dict hit for repeated words (Zipf)."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # id type follows the input (ADVICE r6: a non-long id column must
    # not fail or be silently coerced by a hardcoded LONG)
    id_ddl = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_ddl}, tokens ARRAY<STRING>, n_tokens INT"

    def run(batches):
        cache: dict[str, list[str]] = {}

        def enc_text(text):
            if text is None:
                return []
            out: list[str] = []
            for w in text.split():
                hit = cache.get(w)
                if hit is None:
                    hit = encode_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        for b in batches:
            toks = b[text_col].map(enc_text)
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "tokens": toks,
                    "n_tokens": toks.map(len).astype("int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)
