"""Per-index bm25_k1/bm25_b (IndexOptions, api/types.rs:20-21;
reader inherits at open, reader.rs:1895-1910): stored in the manifest,
read by every scoring path — brute, WAND, BMW — with no layout change
(blocks keep raw max_tf, so upper bounds are recomputed per query
with the index's own k1/b)."""

import math

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
def custom_index(spark, tiny_corpus, tmp_path_factory):
    schema = IndexSchema(
        doc_id_field="_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
        numeric_fields=(NumericField("year"),),
    )
    out = str(tmp_path_factory.mktemp("k1b_index"))
    return build_index(
        spark, tiny_corpus, schema, out, num_partitions=2,
        bm25_k1=1.2, bm25_b=0.75,
    )


def test_params_validated(spark, tiny_corpus, tmp_path_factory):
    schema = IndexSchema(doc_id_field="_id", text_fields=(TextField("body"),))
    out = str(tmp_path_factory.mktemp("bad_k1b"))
    with pytest.raises(ValueError, match="bm25_k1"):
        build_index(spark, tiny_corpus, schema, out, bm25_k1=-0.1)
    with pytest.raises(ValueError, match="bm25_b"):
        build_index(spark, tiny_corpus, schema, out, bm25_b=1.5)


def test_options_recorded_and_inherited(custom_index, tiny_index):
    assert custom_index.options["bm25_k1"] == 1.2
    assert custom_index.options["bm25_b"] == 0.75
    # pre-option / default manifests imply the CLI defaults
    assert tiny_index.options["bm25_k1"] == 0.9
    assert tiny_index.options["bm25_b"] == 0.4
    s = Searcher(custom_index)
    assert (s.k1, s.b) == (1.2, 0.75)


def test_custom_params_change_scores_exactly(custom_index):
    """Hand-computed BM25 at k1=1.2 b=0.75 (bm25.rs:1-6 formula)."""
    s = Searcher(custom_index)
    res = s.search({"query": "rust", "limit": 5})
    n, df, avgdl = 3.0, 2.0, 8.0
    idf = max(math.log((n - df + 0.5) / (df + 0.5)), 0.0) + 1.0
    from searchlite_spark.analysis.tokenizers import default_tokenize

    assert len(res["hits"]) == 2
    for h in res["hits"]:
        dl = float(len(default_tokenize(h["fields"]["body"])))
        denom = 1.0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
        expect = idf * 1.0 * (1.2 + 1.0) / max(denom, 1e-6)
        assert abs(h["score"] - expect) < 1e-5


def test_brute_wand_bmw_identical_at_custom_params(custom_index):
    """The pruning.rs:44-104 equivalence must hold for ANY k1/b: the
    kernels' upper bounds use the same index-level parameters."""
    s = Searcher(custom_index)
    req = {"query": "rust programming language"}
    brute = [(h["doc_id"], round(h["score"], 5)) for h in
             s.search({**req, "limit": 10})["hits"]]
    for mode in ("wand", "bmw"):
        out = s.topk({**req, "execution": mode}, 10).collect()
        assert s.last_execution == mode
        got = [(r["doc_id"], round(r["score"], 5)) for r in out]
        assert got == brute, f"{mode} diverged from brute at k1=1.2 b=0.75"
