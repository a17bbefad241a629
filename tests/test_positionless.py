"""enable_positions=false builds (IndexOptions, api/types.rs:19;
segment.rs:569-585, 833): the positions column is NULL everywhere,
tf/dl/BM25 are byte-identical to a positioned build, and phrase
queries match NOTHING (the phrase.rs:16-18 empty-positions contract).
Appends inherit the option from the manifest (api/writer.rs:172)."""

import pytest

from searchlite_spark.index import (
    IndexSchema,
    KeywordField,
    NumericField,
    TextField,
    build_index,
)
from searchlite_spark.query import Searcher


@pytest.fixture(scope="module")
def schema():
    return IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
        numeric_fields=(NumericField("year"),),
    )


@pytest.fixture(scope="module")
def nopos_index(spark, tiny_corpus, schema, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nopos_index"))
    return build_index(
        spark, tiny_corpus, schema, out, num_partitions=2, enable_positions=False
    )


def test_option_recorded_in_manifest(nopos_index):
    assert nopos_index.options["enable_positions"] is False
    assert nopos_index.manifest["options"]["enable_positions"] is False


def test_default_manifest_implies_positions(tiny_index):
    # pre-option manifests and default builds read back as enabled
    assert tiny_index.options["enable_positions"] is True


def test_positions_column_all_null(nopos_index):
    from pyspark.sql import functions as F

    n_nonnull = (
        nopos_index.postings()
        .where(F.col("positions").isNotNull())
        .count()
    )
    assert n_nonnull == 0


def test_tf_dl_terms_identical_to_positioned_build(nopos_index, tiny_index):
    cols = ["doc_id", "field", "term", "tf", "dl"]
    a = {tuple(r) for r in nopos_index.postings().select(*cols).collect()}
    b = {tuple(r) for r in tiny_index.postings().select(*cols).collect()}
    assert a == b
    ta = {tuple(r) for r in nopos_index.terms().collect()}
    tb = {tuple(r) for r in tiny_index.terms().collect()}
    assert ta == tb
    assert nopos_index.stats["avgdl"] == tiny_index.stats["avgdl"]


def test_bm25_scores_identical(nopos_index, tiny_index):
    req = {"query": "rust programming", "limit": 10}
    a = Searcher(nopos_index).search(req)
    b = Searcher(tiny_index).search(req)
    assert [(h["doc_id"], h["score"]) for h in a["hits"]] == [
        (h["doc_id"], h["score"]) for h in b["hits"]
    ]


def test_phrase_matches_nothing(nopos_index, tiny_index):
    # "programming language" is a real adjacent bigram in doc1+doc2:
    # positioned build finds both, positionless build finds none
    req = {"query": '"programming language"', "limit": 10}
    assert len(Searcher(tiny_index).search(req)["hits"]) == 2
    assert Searcher(nopos_index).search(req)["hits"] == []
    # sloppy phrase: same contract (empty lists fail the slop kernel)
    req_slop = {
        "query": {
            "type": "phrase",
            "field": "body",
            "terms": ["programming", "fast"],
            "slop": 3,
        },
        "limit": 10,
    }
    assert len(Searcher(tiny_index).search(req_slop)["hits"]) == 1
    assert Searcher(nopos_index).search(req_slop)["hits"] == []


def test_python_analyzer_path_also_null(spark, tiny_corpus, tmp_path_factory):
    # stopwords filter forces the non-vectorized Python tokenizer
    schema = IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body", analyzer="stopped"),),
        keyword_fields=(KeywordField("lang"),),
        analyzers=(
            (
                "stopped",
                {
                    "tokenizer": "default",
                    "filters": [{"type": "stopwords", "stopwords": "en"}],
                },
            ),
        ),
    )
    out = str(tmp_path_factory.mktemp("nopos_python"))
    idx = build_index(
        spark, tiny_corpus, schema, out, num_partitions=2, enable_positions=False
    )
    from pyspark.sql import functions as F

    assert idx.postings().where(F.col("positions").isNotNull()).count() == 0


def test_resumable_build_honors_options(spark, tiny_corpus, schema, tmp_path_factory):
    from pyspark.sql import functions as F

    from searchlite_spark.index.resume import build_index_resumable

    out = str(tmp_path_factory.mktemp("nopos_resume"))
    idx = build_index_resumable(
        spark, tiny_corpus, schema, out, chunks=2, num_partitions=4,
        enable_positions=False, bm25_k1=1.1, bm25_b=0.3,
    )
    assert idx.postings().where(F.col("positions").isNotNull()).count() == 0
    assert idx.options["enable_positions"] is False
    assert (idx.options["bm25_k1"], idx.options["bm25_b"]) == (1.1, 0.3)
    assert Searcher(idx).search({"query": '"programming language"'})["hits"] == []


def test_append_inherits_positionless_layout(spark, nopos_index, schema):
    from searchlite_spark.index.append import append_documents
    from pyspark.sql import functions as F

    batch = spark.createDataFrame(
        [("doc4", "rust programming language for spark", "en", 2026)],
        "_id STRING, body STRING, lang STRING, year LONG",
    )
    idx = append_documents(spark, nopos_index, batch)
    assert idx.postings().where(F.col("positions").isNotNull()).count() == 0
    assert idx.options["enable_positions"] is False
    # the appended doc is searchable, phrases still match nothing
    s = Searcher(idx)
    assert any(
        h["fields"]["_id"] == "doc4"
        for h in s.search({"query": "spark", "limit": 10})["hits"]
    )
    assert s.search({"query": '"programming language"', "limit": 10})["hits"] == []
