"""delete_by_id / compact: filtered rewrites must be score-identical to
a fresh build over the surviving corpus (stats recomputed, not stale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchlite_spark.index import (
    IndexSchema,
    KeywordField,
    NumericField,
    TextField,
    build_index,
)
from searchlite_spark.index.maintenance import compact, delete_by_id
from searchlite_spark.query import Searcher


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(["alpha", "beta", "gamma", "delta"][: 1 + i % 4] * (1 + i % 3)),
         "en" if i % 2 else "de", i * 10)
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, body STRING, lang STRING, n LONG"
    )


SCHEMA = IndexSchema(
    doc_id_field="doc_id",
    text_fields=(TextField("body"),),
    keyword_fields=(KeywordField("lang"),),
    numeric_fields=(NumericField("n"),),
)


def _hits(searcher, query):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in searcher.match_set({"query": query})
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]


def test_delete_by_id_matches_fresh_build(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("m_base"))
    deleted = str(tmp_path_factory.mktemp("m_del"))
    fresh = str(tmp_path_factory.mktemp("m_fresh"))
    build_index(spark, corpus, SCHEMA, base, num_partitions=2, id_mode="column")
    drop = [0, 7, 13, 29]
    idx_del = delete_by_id(spark, base, deleted, drop, num_partitions=2)
    idx_fresh = build_index(
        spark, corpus.where(~F.col("doc_id").isin(drop)), SCHEMA, fresh,
        num_partitions=2, id_mode="column",
    )
    # stats fully recomputed
    assert idx_del.stats["n_docs"] == idx_fresh.stats["n_docs"] == 26
    assert idx_del.stats["avgdl"] == idx_fresh.stats["avgdl"]
    s_del, s_fresh = Searcher(idx_del), Searcher(idx_fresh)
    for q in ("alpha", "beta gamma", "delta"):
        assert _hits(s_del, q) == _hits(s_fresh, q)
    # deleted ids are gone everywhere
    assert idx_del.docs().where(F.col("doc_id").isin(drop)).count() == 0
    assert idx_del.postings().where(F.col("doc_id").isin(drop)).count() == 0
    # kernel path agrees post-delete
    out = s_del.topk({"query": "alpha beta", "execution": "bmw"}, 5).collect()
    brute = s_del.topk({"query": "alpha beta", "execution": "bm25"}, 5).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in out] == [
        (r["doc_id"], round(r["score"], 6)) for r in brute
    ]


def test_compact_is_identity(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("c_base"))
    out = str(tmp_path_factory.mktemp("c_out"))
    idx = build_index(spark, corpus, SCHEMA, base, num_partitions=2,
                      id_mode="column")
    idx2 = compact(spark, base, out, num_partitions=2)
    assert idx2.stats == idx.stats
    assert _hits(Searcher(idx2), "alpha gamma") == _hits(Searcher(idx), "alpha gamma")
    assert idx2.manifest["lineage"]["compacted_from"] == base


def test_verify_text_invariant(spark, tmp_path_factory):
    """Per-row invariant (north rule): docstore text is byte-identical
    to the source per url; corruption is detected, sampling works."""
    from searchlite_spark.index.maintenance import verify_text_invariant

    rows = [(f"https://ex.com/{i}", f"text body {i} alpha") for i in range(50)]
    corpus = spark.createDataFrame(rows, "url STRING, text STRING")
    corpus = corpus.withColumn(
        "doc_id", F.xxhash64("url") % 1_000_000_000
    )
    schema = IndexSchema(doc_id_field="doc_id",
                         text_fields=(TextField("text"),))
    out = str(tmp_path_factory.mktemp("inv_idx"))
    idx = build_index(spark, corpus, schema, out, id_mode="column",
                      num_partitions=2)
    res = verify_text_invariant(idx, corpus, key_col="url")
    assert res == {"checked": 50, "mismatched": 0,
                   "missing_in_index": 0, "missing_in_source": 0}
    # sampled run checks a strict subset
    res_s = verify_text_invariant(idx, corpus, key_col="url", sample=0.3)
    assert 0 < res_s["checked"] < 50 and res_s["mismatched"] == 0

    # corrupt one source row -> must raise
    bad = corpus.withColumn(
        "text",
        F.when(F.col("url") == "https://ex.com/7",
               F.lit("TAMPERED")).otherwise(F.col("text")),
    )
    with pytest.raises(ValueError, match="text invariant violated"):
        verify_text_invariant(idx, bad, key_col="url")
    # missing rows are reported, not fatal
    res_m = verify_text_invariant(
        idx, corpus.where(F.col("url") != "https://ex.com/3"), key_col="url"
    )
    assert res_m["missing_in_source"] == 1


def test_compact_in_place_snapshot_isolation(spark, tmp_path):
    """In-place compaction must never break an open reader: tables land
    in fresh versioned dirs, the manifest flips atomically, the old
    generation survives until the NEXT compaction's GC."""
    import os

    from searchlite_spark.index import IndexSchema, TextField, build_index
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.index.maintenance import compact_in_place
    from searchlite_spark.query.engine import Searcher

    corpus = spark.createDataFrame(
        [(str(i), f"rust doc {i} with shared words") for i in range(40)],
        "_id STRING, body STRING",
    )
    schema = IndexSchema(doc_id_field="_id", text_fields=(TextField("body"),))
    path = str(tmp_path / "idx")
    build_index(spark, corpus, schema, path, num_partitions=2)

    old_reader = Searcher(Index(path=path, spark=spark))
    before = old_reader.search({"query": "rust", "limit": 5})
    assert before["total_hits_estimate"] == 40

    compact_in_place(spark, path)
    # the OLD reader still serves its snapshot — its parquet files were
    # not renamed or deleted (this is exactly what the rename-swap
    # design could not provide)
    again = old_reader.search({"query": "shared", "limit": 5})
    assert again["total_hits_estimate"] == 40
    # a NEW reader sees the compacted generation through the pointers
    idx2 = Index(path=path, spark=spark)
    assert idx2.manifest["docs_dir"].startswith("docs_v")
    assert Searcher(idx2).search({"query": "rust", "limit": 5})[
        "total_hits_estimate"] == 40

    # two compactions later, generation 0 (plain dirs) and generation 1
    # are gone; exactly the current + previous versioned dirs remain
    compact_in_place(spark, path)
    names = sorted(n for n in os.listdir(path) if n.startswith("docs"))
    assert len(names) == 2 and all(n.startswith("docs_v") for n in names)
    assert not os.path.isdir(os.path.join(path, "docs"))
