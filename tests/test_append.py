"""Incremental append (reference: new-segment-per-commit,
api/writer.rs:106-239): build + append must be search-identical to a
full rebuild over the concatenated corpus, and append work must scale
with the batch, not the corpus."""

import pytest

from searchlite_spark.query import Searcher


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, body STRING, lang STRING")


ROWS_A = [
    (0, "rust systems programming language fast", "en"),
    (1, "python scripting language easy data", "en"),
    (2, "search engine index postings fast", "de"),
    (3, "spark distributed query engine", "en"),
]
ROWS_B = [
    (10, "rust search engine fast index", "en"),
    (11, "distributed systems programming spark", "de"),
    (12, "language model data index", "en"),
]


@pytest.fixture(scope="module")
def schemas():
    from searchlite_spark.index import IndexSchema, KeywordField, TextField

    return IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
    )


def _search_all(searcher, queries):
    out = {}
    for q in queries:
        res = searcher.search({"query": q, "limit": 10})
        out[q] = [
            (h["doc_id"], round(h["score"], 6)) for h in res["hits"]
        ]
    return out


QUERIES = ["rust", "fast index", "language", "spark -engine", '"search engine"']


def test_append_equals_full_rebuild(spark, tmp_path_factory, schemas):
    from searchlite_spark.index import append_documents, build_index
    from searchlite_spark.index.catalog import Index

    inc_path = str(tmp_path_factory.mktemp("append_inc"))
    full_path = str(tmp_path_factory.mktemp("append_full"))

    idx = build_index(
        spark, _corpus(spark, ROWS_A), schemas, inc_path,
        num_partitions=2, id_mode="column", block_size=4,
    )
    gen_before = idx.manifest["lineage"]["build_id"]
    idx2 = append_documents(
        spark, idx, _corpus(spark, ROWS_B), num_partitions=2,
        id_mode="column",
    )
    full = build_index(
        spark, _corpus(spark, ROWS_A + ROWS_B), schemas, full_path,
        num_partitions=2, id_mode="column", block_size=4,
    )

    # stats parity (df/cf/avgdl recomputed over old+new)
    assert idx2.stats == full.stats
    inc_terms = {
        (r["term"], r["df"], r["cf"], r["max_tf"])
        for r in idx2.terms().collect()
    }
    full_terms = {
        (r["term"], r["df"], r["cf"], r["max_tf"])
        for r in full.terms().collect()
    }
    assert inc_terms == full_terms

    # search parity: identical ids AND scores on every plan flavor
    s_inc, s_full = Searcher(idx2), Searcher(full)
    assert _search_all(s_inc, QUERIES) == _search_all(s_full, QUERIES)

    # kernel path reads the appended blocks (old + new doc ranges)
    for execution in ("wand", "bmw"):
        a = [
            (r["doc_id"], round(r["score"], 6))
            for r in s_inc.topk({"query": "rust fast", "limit": 5,
                                 "execution": execution}).collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 6))
            for r in s_full.topk({"query": "rust fast", "limit": 5,
                                  "execution": execution}).collect()
        ]
        assert a == b
        assert s_inc.last_execution == execution

    # append bumped the generation (open cursors must go stale)
    assert idx2.manifest["lineage"]["build_id"] != gen_before
    assert idx2.manifest["lineage"]["appends"][0]["n_docs"] == len(ROWS_B)


def test_append_assign_mode_and_id_guard(spark, tmp_path_factory, schemas):
    from searchlite_spark.index import append_documents, build_index

    path = str(tmp_path_factory.mktemp("append_assign"))
    idx = build_index(
        spark, _corpus(spark, ROWS_A), schemas, path,
        num_partitions=2, id_mode="column",
    )
    # assign mode: new ids continue after the current max
    batch = spark.createDataFrame(
        [("kz", "zebra quantum rust", "en"), ("ka", "alpha rust", "en")],
        "doc_id STRING, body STRING, lang STRING",
    )
    from searchlite_spark.index import IndexSchema, KeywordField, TextField

    idx2 = append_documents(spark, idx, batch, num_partitions=2)
    new_ids = sorted(
        r["doc_id"] for r in idx2.docs().where("doc_id > 3").collect()
    )
    assert new_ids == [4, 5]  # dense, after old max, in key order
    s = Searcher(idx2)
    res = s.search({"query": "zebra", "limit": 5})
    assert [h["doc_id"] for h in res["hits"]] == [5]  # kz sorts after ka

    # column mode rejects overlapping ids
    with pytest.raises(ValueError, match="doc_id <= current max"):
        append_documents(
            spark, idx2,
            _corpus(spark, [(1, "dup id", "en")]),
            id_mode="column",
        )
