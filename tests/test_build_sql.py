"""Parity of the vectorized (JVM tokenize + pyarrow group-by) build
path vs the Python reference tokenizer path.

The Arrow path (build.py tokenize_postings_arrow) must produce
byte-identical postings — (doc_id, field, term, tf, positions, dl) —
to the Arrow-batched Python analyzer path (tokenize_postings) for the
plain default analyzer (searchlite-core/src/analysis/tokenizer.rs:7-29
semantics).
"""

from __future__ import annotations

import pytest

from searchlite_spark.index.build import (
    sql_tokenize_eligible,
    tokenize_postings,
    tokenize_postings_arrow,
    tokenize_postings_arrow_re2,
    tokenize_postings_best,
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
    "É à ÎLE Straße",  # ASCII-only lower: 'É' stays 'É'
    "中文 测试 abc",  # CJK
    "a-b_c d--e",
    "",
    "punct!!! ??? ...",
    "digits 007 42x 3.14",
    "repeat repeat repeat one two one",
    # scripts with Other_Alphabetic combining marks: Java \p{IsAlphabetic}
    # keeps them in-token while Python isalnum splits — the SQL split
    # class must be \p{L}\p{Nd}\p{Nl}\p{No} so both paths agree
    "नमस्ते दुनिया",  # Devanagari (matras + virama)
    "สวัสดี ชาวโลก",  # Thai (vowel signs)
    "שָׁלוֹם עוֹלָם",  # Hebrew with niqqud
    "مَرْحَبًا بِالْعَالَم",  # Arabic with harakat
]


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
    _, vectorized = tokenize_postings_best(tricky_docs, tricky_schema)
    assert vectorized


def test_sql_path_not_eligible_for_custom_chain(spark, tricky_docs):
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body", analyzer="stem"),),
        analyzers=(("stem", {"tokenizer": "default",
                             "filters": [{"type": "stemmer"}]}),),
    )
    assert not sql_tokenize_eligible(tricky_docs, schema)
    _, vectorized = tokenize_postings_best(tricky_docs, schema)
    assert not vectorized


def test_token_parity_tricky(spark, tricky_docs, tricky_schema):
    py = _canon(tokenize_postings(tricky_docs, tricky_schema))
    arrow = _canon(tokenize_postings_arrow(tricky_docs, tricky_schema))
    assert arrow == py
    re2 = _canon(tokenize_postings_arrow_re2(tricky_docs, tricky_schema))
    assert re2 == py


def test_token_parity_corpus(spark):
    """Real synthetic corpus: the Arrow path reproduces the Python path
    posting-for-posting."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("text"),),
        keyword_fields=(KeywordField("lang"), KeywordField("source")),
    )
    py = _canon(tokenize_postings(docs, schema))
    arrow = _canon(tokenize_postings_arrow(docs, schema))
    assert arrow == py
    re2 = _canon(tokenize_postings_arrow_re2(docs, schema))
    assert re2 == py


def test_two_text_fields_parity(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha", "SrcOne"), (2, None, "two words"),
         (3, "gamma", None)],
        "doc_id LONG, body STRING, extra STRING",
    )
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"), TextField("extra")),
    )
    py = _canon(tokenize_postings(docs, schema))
    arrow = _canon(tokenize_postings_arrow(docs, schema))
    assert arrow == py
    re2 = _canon(tokenize_postings_arrow_re2(docs, schema))
    assert re2 == py
