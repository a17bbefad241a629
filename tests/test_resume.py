"""Interrupted-build resume (FIXTURES.md F8): kill mid-build, re-run,
completed chunks are not recomputed, final index identical to an
uninterrupted build."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"doc {i % 7} rust search engine token{i % 13}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id LONG, body STRING")


def _schema():
    from searchlite_spark.index import IndexSchema, TextField

    return IndexSchema(doc_id_field="doc_id", text_fields=(TextField("body"),))


def _postings_digest(spark, path):
    df = spark.read.parquet(os.path.join(path, "postings"))
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64("term", "doc_id", "tf", "dl"), F.lit(1_000_000_007))).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def test_resume_skips_completed_chunks(spark, corpus, tmp_path):
    from searchlite_spark.index.resume import build_index_resumable

    out_a = str(tmp_path / "interrupted")
    out_b = str(tmp_path / "clean")

    # crash after 2 of 4 chunks — no manifest yet
    r = build_index_resumable(
        spark, corpus, _schema(), out_a, chunks=4, id_mode="column",
        _stop_after_chunks=2,
    )
    assert r is None
    assert not os.path.exists(os.path.join(out_a, "manifest.json"))
    markers = sorted(os.listdir(os.path.join(out_a, "checkpoints")))
    done = [m for m in markers if m.startswith("chunk_") and not m.endswith("-1.json")]
    mtimes = {
        m: os.path.getmtime(os.path.join(out_a, "checkpoints", m)) for m in markers
    }

    # resume: completed chunk markers must be untouched
    idx = build_index_resumable(
        spark, corpus, _schema(), out_a, chunks=4, id_mode="column"
    )
    assert idx is not None
    for m in done:
        assert os.path.getmtime(os.path.join(out_a, "checkpoints", m)) == mtimes[m], (
            f"chunk {m} was recomputed"
        )
    skipped = [
        c for c in idx.manifest["metrics"]["chunks"] if c.get("skipped")
    ]
    assert len(skipped) >= 2

    # uninterrupted build gives the identical index
    build_index_resumable(spark, corpus, _schema(), out_b, chunks=4, id_mode="column")
    assert _postings_digest(spark, out_a) == _postings_digest(spark, out_b)
    with open(os.path.join(out_a, "manifest.json")) as f:
        stats_a = json.load(f)["stats"]
    with open(os.path.join(out_b, "manifest.json")) as f:
        stats_b = json.load(f)["stats"]
    assert stats_a == stats_b


def test_resumable_index_queryable(spark, corpus, tmp_path):
    from searchlite_spark.index.resume import build_index_resumable
    from searchlite_spark.query import Searcher

    out = str(tmp_path / "q")
    idx = build_index_resumable(
        spark, corpus, _schema(), out, chunks=3, id_mode="column"
    )
    s = Searcher(idx)
    res = s.search({"query": "rust", "limit": 5})
    assert res["total_hits_estimate"] == 200
    # kernel path works over chunked blocks too
    top = s.topk({"query": "token3 rust", "limit": 5, "execution": "bmw"}).collect()
    brute = s.topk({"query": "token3 rust", "limit": 5, "execution": "bm25"}).collect()
    assert [r["doc_id"] for r in top] == [r["doc_id"] for r in brute]
