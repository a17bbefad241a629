"""search_as_you_type auto-generated analyzers (manifest.rs:193-213):
index analyzer = base + edge_ngram(min,max), search analyzer = base."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchlite_spark.index import IndexSchema, TextField, build_index
from searchlite_spark.query import Searcher


def test_index_analyzer_gains_edge_ngram():
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body", search_as_you_type=(1, 10)),),
    )
    idx_a = schema.index_analyzer_for("body")
    search_a = schema.search_analyzer_for("body")
    assert ("edge_ngram", (1, 10)) in idx_a.filters
    assert not search_a.filters
    # round-trips through the manifest
    back = IndexSchema.from_dict(schema.to_dict())
    assert back.text_fields[0].search_as_you_type == (1, 10)
    assert ("edge_ngram", (1, 10)) in back.index_analyzer_for("body").filters


def test_invalid_grams_rejected():
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body", search_as_you_type=(5, 2)),),
    )
    with pytest.raises(ValueError):
        schema.index_analyzer_for("body")


def test_partial_token_matches(spark, tmp_path_factory):
    corpus = spark.createDataFrame(
        [(1, "python spark engine"), (2, "java runtime"), (3, "pythagoras theorem")],
        "doc_id LONG, body STRING",
    )
    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body", search_as_you_type=(1, 8)),),
    )
    out = str(tmp_path_factory.mktemp("saty_idx"))
    s = Searcher(build_index(spark, corpus, schema, out, num_partitions=2,
                             id_mode="column", build_blocks=False))
    hits = lambda q: sorted(
        r["doc_id"] for r in s.match_set({"query": q}).collect()
    )
    assert hits("pyth") == [1, 3]      # partial token, no prefix query needed
    assert hits("python") == [1]
    assert hits("jav") == [2]
    assert hits("zzz") == []
