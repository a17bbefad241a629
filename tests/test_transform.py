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


def test_pack_sequences_exact_layout(spark):
    from searchlite_spark.textops import pack_sequences

    rows = [(i, " ".join(f"t{j}" for j in range(n)))
            for i, n in enumerate([3, 9, 4, 10, 1, 25, 2, 7])]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = [tuple(r) for r in
           pack_sequences(df, budget=10).orderBy("pack_id", "doc_id").collect()]
    # counts 3,9,4,10,1,25,2,7 -> starts 0,3,12,16,26,27,52,54 (total 61);
    # the 61-token stream splits at 10,20,...,60 — hand-derived layout:
    assert got == [
        (0, 0, 0, 3), (0, 1, 0, 7),
        (1, 1, 7, 2), (1, 2, 0, 4), (1, 3, 0, 4),
        (2, 3, 4, 6), (2, 4, 0, 1), (2, 5, 0, 3),
        (3, 5, 3, 10),           # doc 5 (25 tokens) fills pack 3 alone
        (4, 5, 13, 10),          # ... and pack 4
        (5, 5, 23, 2), (5, 6, 0, 2), (5, 7, 0, 6),
        (6, 7, 6, 1),            # trailing remainder pack
    ]


def test_pack_sequences_partition_independent(spark):
    """The packing depends only on document order: any partition count
    (and the pre-tokenized n_tokens_col path) gives identical packs."""
    from pyspark.sql import functions as F

    from searchlite_spark.textops import pack_sequences

    rows = [(i, " ".join("x" * 1 for _ in range(1 + (i * 7) % 13)))
            for i in range(101)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    base = sorted(map(tuple, pack_sequences(df, budget=17,
                                            num_partitions=1).collect()))
    for parts in (3, 16):
        alt = sorted(map(tuple, pack_sequences(df, budget=17,
                                               num_partitions=parts).collect()))
        assert alt == base
    pre = df.withColumn(
        "nt", F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                              lambda t: t != "")))
    via_col = sorted(map(tuple, pack_sequences(
        pre, budget=17, n_tokens_col="nt", num_partitions=5).collect()))
    assert via_col == base


def test_pack_sequences_invariants(spark):
    """Every pack but the last is exactly `budget` tokens; each doc's
    slices are contiguous from 0 and sum to its token count; empty
    docs are dropped."""
    from pyspark.sql import functions as F

    from searchlite_spark.textops import pack_sequences

    rows = [(i, " ".join(f"t{j}" for j in range((i * 31) % 57)))
            for i in range(200)]  # includes several 0-token docs
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    packed = pack_sequences(df, budget=64, num_partitions=4)
    agg = packed.groupBy("pack_id").agg(F.sum("slice_len").alias("s"))
    last = agg.agg(F.max("pack_id")).first()[0]
    assert agg.where((F.col("s") != 64) & (F.col("pack_id") != last)).count() == 0
    per_doc = packed.groupBy("doc_id").agg(
        F.sum("slice_len").alias("tot"),
        F.min("slice_start").alias("mn"),
        F.count("*").alias("k"),
        (F.max(F.col("slice_start") + F.col("slice_len"))).alias("end"),
    )
    n_tok = df.select(
        "doc_id",
        F.size(F.filter(F.split(F.trim("text"), r"\s+"),
                        lambda t: t != "")).alias("n"),
    ).where(F.col("n") > 0)
    joined = n_tok.join(per_doc, "doc_id", "full")
    # no doc lost, none invented, totals match, slices contiguous
    assert joined.where(
        F.col("n").isNull() | F.col("tot").isNull()
        | (F.col("tot") != F.col("n")) | (F.col("mn") != 0)
        | (F.col("end") != F.col("n"))
    ).count() == 0
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
