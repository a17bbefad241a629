"""drop_duplicated_spans: first-occurrence-wins span removal — hand
cases for full-copy, partial-overlap, and within-doc repetition, plus
token accounting and partition invariance.
"""

from __future__ import annotations

import pytest

from searchlite_spark.textops import drop_duplicated_spans


def _run(spark, texts, window=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    return {
        r["doc_id"]: r
        for r in drop_duplicated_spans(df, window=window).collect()
    }


def test_exact_copy_loses_everything(spark):
    out = _run(spark, ["a b c d e", "a b c d e", "p q r s"])
    assert out[0]["text"] == "a b c d e"
    assert out[0]["n_tokens_removed"] == 0
    # doc 1: both 4-windows duplicated, first occurrences live in doc 0
    assert out[1]["text"] == ""
    assert out[1]["n_tokens_removed"] == 5
    assert out[2]["text"] == "p q r s" and out[2]["n_tokens_removed"] == 0


def test_partial_overlap_removes_only_shared_span(spark):
    # doc 1 shares the 4-token span "c d e f" with doc 0 but keeps its
    # unique tail; masked tokens are exactly the span's four
    out = _run(spark, ["a b c d e f", "c d e f x y z w"])
    assert out[0]["n_tokens_removed"] == 0
    assert out[1]["text"] == "x y z w"
    assert out[1]["n_tokens_removed"] == 4


def test_within_doc_repeat_keeps_first(spark):
    out = _run(spark, ["m n o p m n o p"])
    assert out[0]["text"] == "m n o p"
    assert out[0]["n_tokens_before"] == 8
    assert out[0]["n_tokens_removed"] == 4


def test_short_and_empty_docs_pass_through(spark):
    out = _run(spark, ["a b c", "", "x"])
    assert out[0]["text"] == "a b c" and out[0]["n_tokens_removed"] == 0
    assert out[1]["text"] == "" and out[1]["n_tokens_before"] == 0
    assert out[2]["text"] == "x"


def test_overlapping_dup_spans_union_masks(spark):
    # doc 1 repeats doc 0's full 6 tokens; doc 2 repeats a 5-token
    # slice -> two overlapping duplicated windows union to 5 masked
    out = _run(spark, ["a b c d e f", "a b c d e f", "b c d e f"])
    assert out[1]["text"] == "" and out[1]["n_tokens_removed"] == 6
    assert out[2]["text"] == "" and out[2]["n_tokens_removed"] == 5


def test_partition_invariance(spark):
    texts = [f"w{i % 4} x{i % 3} y z common run of tokens {i % 2}" for i in range(30)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    a = sorted(map(tuple, drop_duplicated_spans(df, window=4).collect()))
    b = sorted(
        map(
            tuple,
            drop_duplicated_spans(df.repartition(13), window=4).collect(),
        )
    )
    assert a == b


def test_window_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError):
        drop_duplicated_spans(df, window=1)
