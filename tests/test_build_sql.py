"""Parity of the JVM (SQL-expression) tokenize path vs the Python
reference tokenizer path in the index build.

The SQL path (build.py tokenize_token_rows_sql + _pack_sorted_tokens)
must produce byte-identical postings — (doc_id, field, term, tf,
positions, dl) — to the Arrow-batched Python analyzer path
(tokenize_postings) for the plain default analyzer
(searchlite-core/src/analysis/tokenizer.rs:7-29 semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchlite_spark.index.build import (
    _pack_sorted_tokens,
    POSTING_SCHEMA,
    sql_tokenize_eligible,
    tokenize_postings,
    tokenize_token_rows_sql,
)
from searchlite_spark.index.schema import (
    IndexSchema,
    KeywordField,
    TextField,
)

TRICKY = [
    "Hello, World! FOO_bar",
    "the quick  brown\tfox \n jumps",
    "  leading and trailing  ",
    "naive cafe 123abc x42 42",
    "E A ILE CASE MiXeD",
    "É à ÎLE Straße",  # É à ÎLE Straße (ASCII-only lower)
    "中文 测试 abc",  # CJK
    "a-b_c d--e",
    "",
    "punct!!! ??? ...",
    "digits 007 42x 3.14",
]


def _sql_postings(spark, docs, schema):
    token_rows = tokenize_token_rows_sql(docs, schema)
    return (
        token_rows.repartitionByRange(2, "term", "doc_id")
        .sortWithinPartitions("term", "doc_id", "pos")
        .mapInPandas(_pack_sorted_tokens, POSTING_SCHEMA)
    )


def _canon(df):
    return sorted(
        (r["doc_id"], r["field"], r["term"], r["tf"], tuple(r["positions"]),
         r["dl"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def tricky_docs(spark):
    rows = [(i, t, ["TagA", "tagb", "TAGA"] if i % 2 else None, "SrC%d" % i)
            for i, t in enumerate(TRICKY)]
    return spark.createDataFrame(
        rows, "doc_id LONG, body STRING, tags ARRAY<STRING>, src STRING"
    )


@pytest.fixture(scope="module")
def tricky_schema():
    return IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("tags"), KeywordField("src")),
    )


def test_sql_path_eligible(tricky_docs, tricky_schema):
    assert sql_tokenize_eligible(tricky_docs, tricky_schema)


def test_sql_path_not_eligible_for_custom_chain(spark, tricky_docs):
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body", analyzer="stem"),),
        analyzers=(("stem", {"tokenizer": "default",
                             "filters": [{"type": "stemmer"}]}),),
    )
    assert not sql_tokenize_eligible(tricky_docs, schema)


def test_token_parity_tricky(spark, tricky_docs, tricky_schema):
    py = _canon(tokenize_postings(tricky_docs, tricky_schema))
    sql = _canon(_sql_postings(spark, tricky_docs, tricky_schema))
    assert sql == py


def test_token_parity_corpus(spark):
    """Real synthetic corpus: the SQL path reproduces the Python path
    posting-for-posting."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("text"),),
        keyword_fields=(KeywordField("lang"), KeywordField("source")),
    )
    py = _canon(tokenize_postings(docs, schema))
    sql = _canon(_sql_postings(spark, docs, schema))
    assert sql == py


def test_batch_boundary_runs(spark):
    """A (term, doc_id) run spanning Arrow batch boundaries must merge
    into one posting (the carry logic in _pack_sorted_tokens)."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1] * 5 + [2] * 3,
            "field": ["body"] * 8,
            "term": ["body:x"] * 5 + ["body:y"] * 3,
            "pos": [0, 1, 2, 3, 4, 0, 1, 2],
            "dl": [5] * 5 + [3] * 3,
        }
    )
    batches = [rows.iloc[:2], rows.iloc[2:4], rows.iloc[4:6], rows.iloc[6:]]
    out = pd.concat(list(_pack_sorted_tokens(iter(batches))), ignore_index=True)
    got = sorted(
        (int(r.doc_id), r.term, int(r.tf), tuple(r.positions), int(r.dl))
        for r in out.itertuples()
    )
    assert got == [
        (1, "body:x", 5, (0, 1, 2, 3, 4), 5),
        (2, "body:y", 3, (0, 1, 2), 3),
    ]
