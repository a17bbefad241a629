"""Passage chunking and PII redaction contracts."""

from __future__ import annotations

import pytest

from searchlite_spark.textops import chunk_documents, redact_pii


def test_chunk_no_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_tokens=3).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in rows] == [
        (0, "a b c", 3),
        (1, "d e f", 3),
        (2, "g", 1),
    ]


def test_chunk_with_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7")], "doc_id long, text string"
    )
    # stride 3, window 5: [0..4], [3..7]
    rows = (
        chunk_documents(docs, chunk_tokens=5, overlap=2)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r["chunk_text"] for r in rows] == ["t0 t1 t2 t3 t4", "t3 t4 t5 t6 t7"]


def test_chunk_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "only two"), (2, "")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_tokens=10).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in rows] == [
        (1, 0, "only two", 2),
        (2, 0, "", 0),
    ]


def test_chunk_overlap_must_be_smaller():
    with pytest.raises(ValueError):
        chunk_documents(None, chunk_tokens=4, overlap=4)


def test_chunk_every_token_covered(spark):
    text = " ".join(f"w{i}" for i in range(97))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=16, overlap=4).collect()
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(97)}
    # uniform stride: every chunk except the last is full-size
    sizes = [r["n_tokens"] for r in sorted(rows, key=lambda r: r["chunk_id"])]
    assert all(s == 16 for s in sizes[:-1]) and 0 < sizes[-1] <= 16


def test_redact_counts_and_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob@x.org or alice@y.co, call +12345678 from 10.0.0.7"),
            (2, "clean text, no pii at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    r1 = rows[1]
    assert r1["n_email"] == 2 and r1["n_ipv4"] == 1 and r1["n_phone"] == 1
    assert (
        r1["text"]
        == "mail [email] or [email], call [phone] from [ipv4]"
    )
    r2 = rows[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)
    assert r2["text"] == "clean text, no pii at all"
