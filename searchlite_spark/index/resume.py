"""Resumable, checkpointed index build (per-partition lineage).

The north rule requires interrupted builds to resume without
recomputation, with per-partition lineage + metrics.  This mirrors the
reference's durability discipline — immutable segments + atomic
manifest (searchlite-core/src/index/manifest.rs:60-79, wal.rs) — in
lake form:

* the corpus is split into **chunks** (contiguous doc-id ranges — the
  analogue of segments);
* each chunk builds its postings + blocks independently and commits a
  lineage marker ``checkpoints/chunk_<i>.json`` with the input
  snapshot id, row counts and a content checksum;
* a re-run skips every chunk whose marker matches the input snapshot
  (idempotent overwrite otherwise);
* ``finalize`` derives the global tables (docs/dl, terms, stats) from
  the chunk outputs and commits the manifest atomically — the build is
  not queryable until the manifest lands.

Chunk outputs live under ``postings/chunk=<i>/`` so a plain
``spark.read.parquet(postings)`` sees the union; within a chunk the
rows are sorted by (term, doc_id), so Parquet row-group pruning on
``term`` works per chunk exactly as in the single-shot build (the
kernel's doc-range bucketing is likewise unaffected — chunks ARE doc
ranges).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from searchlite_spark.index.blocks import BLOCK_SCHEMA, pack_partition
from searchlite_spark.index.build import assign_doc_ids, tokenize_postings_best
from searchlite_spark.index.catalog import Index, write_manifest
from searchlite_spark.index.schema import IndexSchema


def _marker_path(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, "checkpoints", f"chunk_{i}.json")


def _read_marker(out_dir: str, i: int) -> dict | None:
    p = _marker_path(out_dir, i)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_marker(out_dir: str, i: int, payload: dict) -> None:
    os.makedirs(os.path.join(out_dir, "checkpoints"), exist_ok=True)
    tmp = _marker_path(out_dir, i) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _marker_path(out_dir, i))


def build_chunk(
    spark: SparkSession,
    docs: DataFrame,
    schema: IndexSchema,
    out_dir: str,
    chunk_id: int,
    lo: int,
    hi: int,
    input_snapshot: str,
    block_size: int = 128,
    partitions_per_chunk: int = 8,
    positions: bool = True,
) -> dict:
    """Build postings + blocks for doc_id in [lo, hi]; commit marker."""
    from pyspark import StorageLevel

    t0 = time.time()
    part = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
    postings, vectorized = tokenize_postings_best(part, schema, positions)
    if not vectorized:
        postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    sorted_p = postings.repartitionByRange(
        partitions_per_chunk, "term", "doc_id"
    ).sortWithinPartitions("term", "doc_id")
    pdir = os.path.join(out_dir, "postings", f"chunk={chunk_id}")
    sorted_p.write.mode("overwrite").parquet(pdir)
    if not vectorized:
        postings.unpersist()
    written = spark.read.parquet(pdir)
    stats = written.agg(
        F.count("*").alias("rows"),
        # mod keeps the running sum inside 64 bits under ANSI mode
        F.sum(F.pmod(F.xxhash64("term", "doc_id", "tf"), F.lit(1_000_000_007))).alias(
            "checksum"
        ),
    ).collect()[0]
    bdir = os.path.join(out_dir, "blocks", f"chunk={chunk_id}")
    written.select("term", "doc_id", "tf", "dl").mapInPandas(
        lambda it: pack_partition(it, block_size), BLOCK_SCHEMA
    ).write.mode("overwrite").parquet(bdir)
    marker = {
        "chunk": chunk_id,
        "doc_range": [lo, hi],
        "input_snapshot": input_snapshot,
        "rows": int(stats["rows"]),
        "checksum": int(stats["checksum"] or 0),
        "build_secs": round(time.time() - t0, 3),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    _write_marker(out_dir, chunk_id, marker)
    return marker


def build_index_resumable(
    spark: SparkSession,
    corpus: DataFrame,
    schema: IndexSchema,
    out_dir: str,
    chunks: int = 8,
    block_size: int = 128,
    id_mode: str = "assign",
    input_snapshot: str | None = None,
    num_partitions: int | None = None,
    enable_positions: bool = True,
    bm25_k1: float = 0.9,
    bm25_b: float = 0.4,
    _stop_after_chunks: int | None = None,  # test hook: simulate a crash
) -> Index | None:
    """Options mirror build_index (the reference's IndexOptions): they
    are per-INDEX, so every chunk builds with the same positions flag
    and the finalize step records them in the one manifest."""
    if bm25_k1 < 0:
        raise ValueError(f"bm25_k1 must be >= 0, got {bm25_k1}")
    if not (0.0 <= bm25_b <= 1.0):
        raise ValueError(f"bm25_b must be in [0, 1], got {bm25_b}")
    t0 = time.time()
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if input_snapshot is None:
        # content-derived snapshot id: row count (cheap, catches size
        # changes; pass an Iceberg snapshot id in production)
        input_snapshot = f"rows={corpus.count()}"

    # ---- docs base (ids assigned once, checkpointed) ----
    base_dir = os.path.join(out_dir, "docs_base")
    base_marker = _read_marker(out_dir, -1)
    if base_marker is None or base_marker.get("input_snapshot") != input_snapshot:
        if id_mode == "column":
            docs = corpus
            if "doc_id" not in corpus.columns:
                docs = docs.withColumn(
                    "doc_id", F.col(schema.doc_id_field).cast("long")
                )
        else:
            docs = assign_doc_ids(corpus, schema.doc_id_field, num_partitions)
        docs.repartitionByRange(num_partitions, "doc_id").sortWithinPartitions(
            "doc_id"
        ).write.mode("overwrite").parquet(base_dir)
        _write_marker(
            out_dir, -1, {"chunk": -1, "input_snapshot": input_snapshot}
        )
    docs = spark.read.parquet(base_dir)

    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max((hi - lo + 1 + chunks - 1) // chunks, 1)

    done = 0
    metrics = []
    for i in range(chunks):
        clo, chi = lo + i * width, min(lo + (i + 1) * width - 1, hi)
        if clo > hi:
            break
        marker = _read_marker(out_dir, i)
        if marker is not None and marker.get("input_snapshot") == input_snapshot:
            metrics.append({**marker, "skipped": True})
            continue
        marker = build_chunk(
            spark, docs, schema, out_dir, i, clo, chi, input_snapshot,
            block_size, max(num_partitions // chunks, 2),
            positions=enable_positions,
        )
        metrics.append(marker)
        done += 1
        if _stop_after_chunks is not None and done >= _stop_after_chunks:
            return None  # simulated crash: no manifest, resumable

    return finalize_index(
        spark, schema, out_dir, block_size, input_snapshot, metrics,
        num_partitions, time.time() - t0,
        options={
            "enable_positions": bool(enable_positions),
            "bm25_k1": float(bm25_k1),
            "bm25_b": float(bm25_b),
        },
    )


def finalize_index(
    spark, schema, out_dir, block_size, input_snapshot, chunk_metrics,
    num_partitions, build_secs, options: dict | None = None,
) -> Index:
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    docs = spark.read.parquet(os.path.join(out_dir, "docs_base"))

    text_names = schema.text_field_names
    docs_path = os.path.join(out_dir, "docs")
    docs.repartitionByRange(num_partitions, "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.mode("overwrite").parquet(docs_path)

    (
        postings.groupBy("term")
        .agg(
            F.first("field").alias("field"),
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
        )
        .repartitionByRange(max(num_partitions // 4, 1), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "terms"))
    )

    import numpy as np

    agg = docs.agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    ).first()
    n_docs = int(agg["n"])
    max_doc_id = int(agg["mx"]) if agg["mx"] is not None else -1
    totals_rows = (
        postings.where(F.col("field").isin(text_names))
        .groupBy("field")
        .agg(F.sum("tf").alias("total"))
        .collect()
        if text_names
        else []
    )
    totals = {f"total_{r['field']}": r["total"] for r in totals_rows}
    avgdl = {
        f: float(np.float32(totals.get(f"total_{f}") or 0) / np.float32(n_docs))
        if n_docs
        else 0.0
        for f in text_names
    }
    manifest = {
        "format_version": 1,
        "schema": schema.to_dict(),
        "stats": {
            "n_docs": int(n_docs),
            "avgdl": avgdl,
            "total_tokens": {
                f: int(totals.get(f"total_{f}") or 0) for f in text_names
            },
            "max_doc_id": max_doc_id,
        },
        "block_size": block_size,
        "options": dict(options) if options else {},
        "metrics": {
            "build_secs": round(build_secs, 3),
            "n_docs": int(n_docs),
            "docs_per_sec": round(n_docs / build_secs, 1) if build_secs else None,
            "chunks": chunk_metrics,
        },
        "lineage": {
            "input_snapshot": input_snapshot,
            "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "resumable": True,
        },
    }
    write_manifest(out_dir, manifest)
    return Index(path=out_dir, spark=spark)
