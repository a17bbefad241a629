"""Streaming ingestion: micro-batches become incremental index commits
(foreachBatch -> append_documents), results identical to a batch build;
replayed batch_ids are skipped (effective exactly-once)."""

import os
import time

import pytest

from searchlite_spark.query import Searcher


ROWS1 = [
    (0, "rust systems language", "en"),
    (1, "python scripting data", "en"),
]
ROWS2 = [
    (10, "rust search engine", "de"),
    (11, "spark streaming ingest", "en"),
]


def _write(spark, rows, path):
    spark.createDataFrame(
        rows, "doc_id LONG, body STRING, lang STRING"
    ).coalesce(1).write.mode("append").parquet(path)


def test_stream_append_equals_batch_build(spark, tmp_path_factory):
    from searchlite_spark.index import (
        IndexSchema, KeywordField, TextField, build_index,
    )
    from searchlite_spark.index.catalog import Index
    from searchlite_spark.streaming import stream_append

    schema = IndexSchema(
        doc_id_field="doc_id",
        text_fields=(TextField("body"),),
        keyword_fields=(KeywordField("lang"),),
    )
    src = str(tmp_path_factory.mktemp("stream_src"))
    idx_path = str(tmp_path_factory.mktemp("stream_idx"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    # base index from the first file (the "bootstrap" build)
    _write(spark, ROWS1, src)
    build_index(
        spark, spark.read.parquet(src), schema, idx_path,
        num_partitions=2, id_mode="column",
    )

    # second file arrives; drain it through the streaming path
    _write(spark, ROWS2, src)
    stream = (
        spark.readStream.schema("doc_id LONG, body STRING, lang STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .where("doc_id >= 10")  # only the new arrivals; base already built
    )
    q = stream_append(spark, idx_path, stream, ckpt, id_mode="column")
    q.awaitTermination(120)

    idx = Index(idx_path, spark)
    assert idx.manifest["lineage"]["stream_max_batch"] >= 0
    assert idx.stats["n_docs"] == 4

    full = build_index(
        spark,
        spark.createDataFrame(ROWS1 + ROWS2,
                              "doc_id LONG, body STRING, lang STRING"),
        schema, str(tmp_path_factory.mktemp("stream_full")),
        num_partitions=2, id_mode="column",
    )
    assert idx.stats == full.stats
    s, sf = Searcher(idx), Searcher(full)
    for qq in ["rust", "streaming", "data engine"]:
        a = [(h["doc_id"], round(h["score"], 6))
             for h in s.search({"query": qq, "limit": 10})["hits"]]
        b = [(h["doc_id"], round(h["score"], 6))
             for h in sf.search({"query": qq, "limit": 10})["hits"]]
        assert a == b, qq

    # replay protection: the watermark (recorded atomically with the
    # append's manifest) makes a replayed ACKNOWLEDGED batch a no-op —
    # exercised directly through the sink, not through the checkpoint
    from searchlite_spark.index.catalog import Index as _I
    from searchlite_spark.streaming import apply_stream_batch

    mark = _I(idx_path, spark).manifest["lineage"]["stream_max_batch"]
    n_before = _I(idx_path, spark).stats["n_docs"]
    replay_df = spark.createDataFrame(
        ROWS2, "doc_id LONG, body STRING, lang STRING"
    )
    # crash-replay of the last acknowledged batch: same batch_id again
    assert apply_stream_batch(
        spark, idx_path, replay_df, mark, id_mode="column"
    ) is False
    assert _I(idx_path, spark).stats["n_docs"] == n_before

    # a genuinely NEW batch id with fresh ids still applies
    new_df = spark.createDataFrame(
        [(20, "brand new page", "en")], "doc_id LONG, body STRING, lang STRING"
    )
    assert apply_stream_batch(
        spark, idx_path, new_df, mark + 1, id_mode="column"
    ) is True
    assert _I(idx_path, spark).stats["n_docs"] == n_before + 1
    assert _I(idx_path, spark).manifest["lineage"]["stream_max_batch"] == mark + 1
