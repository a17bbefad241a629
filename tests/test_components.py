"""Connected components + survivor selection + line-level dedup.

The components algorithm is the cluster step the pair generators feed
(pairs alone don't dedup anything); it must get transitive closure
right — including the chain shape that breaks naive min-propagation's
round count — and pick the min-id canonical deterministically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchlite_spark.textops import (
    connected_components,
    line_dedup,
    near_dedup_survivors,
)


def _cc_map(pairs_df):
    return {
        r["node"]: r["component"] for r in connected_components(pairs_df).collect()
    }


def test_components_basic_clusters(spark):
    # {1,2,3} via 1-2, 2-3; {10,11}; 20-20 self loop ignored
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "id_a long, id_b long"
    )
    got = _cc_map(pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_chain_converges_in_log_rounds(spark):
    # A 64-node path graph: diameter 63, so naive min-propagation needs
    # ~63 rounds; large-star/small-star must finish well under the cap.
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = _cc_map(pairs)
    assert got == {i: 0 for i in range(n)}


def test_components_reversed_and_duplicate_edges(spark):
    pairs = spark.createDataFrame(
        [(5, 3), (3, 5), (5, 3), (7, 5)], "id_a long, id_b long"
    )
    got = _cc_map(pairs)
    assert got == {3: 3, 5: 3, 7: 3}


def test_components_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_survivors_keep_min_and_isolated(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 4), (4, 6), (2, 3)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in near_dedup_survivors(docs, pairs).collect()
    )
    # clusters {1,4,6} -> 1, {2,3} -> 2; isolated 0,5,7 survive
    assert kept == [0, 1, 2, 5, 7]


def test_line_dedup_removes_shared_lines_preserves_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique alpha\nSHARED BOILER\nunique beta"),
            (2, "SHARED BOILER\nonly two"),
            (3, "  SHARED BOILER  \nthird text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["lines_removed"])
        for r in line_dedup(docs, min_docs=2).collect()
    }
    # trimmed-form matching: doc 3's padded variant counts + is removed
    assert out[1] == ("unique alpha\nunique beta", 1)
    assert out[2] == ("only two", 1)
    assert out[3] == ("third text", 1)


def test_line_dedup_regex_special_separator_is_literal(spark):
    """A regex-special line_sep like "|" must split on the literal
    character — F.split takes a Java regex, so an unquoted "|" would
    explode the text per-character and shred every document."""
    docs = spark.createDataFrame(
        [
            (1, "keep one|BOILER|keep two"),
            (2, "BOILER|other line"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["lines_removed"])
        for r in line_dedup(docs, min_docs=2, line_sep="|").collect()
    }
    assert out[1] == ("keep one|keep two", 1)
    assert out[2] == ("other line", 1)


def test_line_dedup_separator_containing_quote_end(spark):
    r"""A line_sep containing the literal two-char sequence ``\E`` must
    still be treated literally: a naive \Q...\E wrap would end the
    quote region at the embedded \E and interpret the remainder as
    regex (Java Pattern.quote escapes this case specially — so do we)."""
    sep = "\\E|"  # backslash, E, pipe — the \E ends a naive \Q region
    docs = spark.createDataFrame(
        [
            (1, f"keep one{sep}BOILER{sep}keep two"),
            (2, f"BOILER{sep}other line"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["lines_removed"])
        for r in line_dedup(docs, min_docs=2, line_sep=sep).collect()
    }
    assert out[1] == (f"keep one{sep}keep two", 1)
    assert out[2] == ("other line", 1)


def test_line_dedup_empty_lines_never_boilerplate(spark):
    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "c\n\nd")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in line_dedup(docs, min_docs=2).collect()}
    assert out == {1: "a\n\nb", 2: "c\n\nd"}


def test_line_dedup_hollow_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, "SAME"), (2, "SAME"), (3, "other")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["text"], r["lines_removed"])
        for r in line_dedup(docs, min_docs=2).collect()
    }
    assert out[1] == ("", 1)
    assert out[2] == ("", 1)
    assert out[3] == ("other", 0)


def test_line_dedup_threshold_respected(spark):
    docs = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\nz"), (3, "x\nw")], "doc_id long, text string"
    )
    out3 = {r["doc_id"]: r["text"] for r in line_dedup(docs, min_docs=3).collect()}
    assert out3 == {1: "y", 2: "z", 3: "w"}
    out4 = {r["doc_id"]: r["text"] for r in line_dedup(docs, min_docs=4).collect()}
    assert out4 == {1: "x\ny", 2: "x\nz", 3: "x\nw"}


def test_minhash_dedup_end_to_end(spark):
    # 3 exact copies of one text + 2 unrelated docs: exact copies have
    # identical signatures, so LSH pairs them with certainty
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base),
         (10, "one two three four five six seven eight"),
         (11, "red green blue cyan magenta yellow black white")],
        "doc_id long, text string",
    )
    from searchlite_spark.textops import minhash_dedup

    kept = sorted(r["doc_id"] for r in minhash_dedup(docs).collect())
    assert kept == [1, 10, 11]


def test_decontaminate_drops_ngram_overlap(spark):
    from searchlite_spark.textops import decontaminate

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a totally different sentence with no overlap at all"),
         (3, "prefix words then quick brown fox jumps over suffix")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [("benchmark says quick brown fox jumps over everything",)],
        "text string",
    )
    # 5-gram "quick brown fox jumps over" appears in docs 1 and 3
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, probes, n=5).collect()
    )
    assert kept == [2]


def test_decontaminate_short_docs_survive(spark):
    from searchlite_spark.textops import decontaminate

    docs = spark.createDataFrame(
        [(1, "too short to match"), (2, "quick brown fox jumps over")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [("quick brown fox jumps over",)], "text string"
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(docs, probes, n=5).collect()
    )
    assert kept == [1]
