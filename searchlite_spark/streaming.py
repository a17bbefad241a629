"""Continuous ingestion: Structured Streaming → incremental index
commits.

The reference has no streaming surface — its writer buffers adds in a
WAL and commits segments (api/writer.rs:106-239).  The Spark-first
equivalent of "a crawler keeps feeding pages" is a streaming source
whose micro-batches become new-segment commits: ``foreachBatch`` →
``append_documents``.  Each micro-batch pays batch-sized work (see
append.py); readers re-open the index to see newly committed batches,
exactly like the reference's visible-on-commit contract.

Delivery semantics: Structured Streaming replays an unacknowledged
micro-batch after a crash, and a parquet file append is not
idempotent — so ``stream_append`` records every applied ``batch_id``
in the manifest lineage and SKIPS batches already applied, upgrading
foreachBatch's at-least-once to effective exactly-once (the standard
idempotent-sink recipe).  The check-and-append runs inside the
single-writer contract the index already has (one writer at a time,
matching the reference's single-writer lock, writer.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from searchlite_spark.index.append import append_documents
from searchlite_spark.index.catalog import Index, write_manifest


def stream_append(
    spark: SparkSession,
    index_path: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    id_mode: str = "assign",
    num_partitions: int | None = None,
    trigger: dict | None = None,
):
    """Start a streaming query appending every micro-batch to the index
    at ``index_path``.  ``stream_df`` must be a streaming DataFrame in
    the corpus schema; ``trigger`` defaults to ``availableNow`` (drain
    what exists, then stop) — pass e.g. ``{"processingTime": "1 minute"}``
    for continuous ingest.  Returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = Index(path=index_path, spark=spark)
        applied = (idx.manifest.get("lineage") or {}).get("stream_batches", [])
        if int(batch_id) in applied:
            return  # replay after crash — already committed
        idx = append_documents(
            spark, idx, batch_df, num_partitions=num_partitions, id_mode=id_mode
        )
        manifest = dict(idx.manifest)
        lineage = dict(manifest.get("lineage") or {})
        lineage["stream_batches"] = list(applied) + [int(batch_id)]
        manifest["lineage"] = lineage
        write_manifest(index_path, manifest)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(**trigger)
    return writer.start()
