"""Continuous ingestion: Structured Streaming → incremental index
commits.

The reference has no streaming surface — its writer buffers adds in a
WAL and commits segments (api/writer.rs:106-239).  The Spark-first
equivalent of "a crawler keeps feeding pages" is a streaming source
whose micro-batches become new-segment commits: ``foreachBatch`` →
``append_documents``.  Each micro-batch pays batch-sized work (see
append.py); readers re-open the index to see newly committed batches,
exactly like the reference's visible-on-commit contract.

Delivery semantics.  Structured Streaming replays an unacknowledged
micro-batch after a crash, and a parquet file append is not
idempotent, so:

* the applied-batch watermark (``stream_max_batch`` — batch ids are
  monotonically increasing, only the most recent unacknowledged batch
  is ever replayed, so a single max suffices and stays O(1)) is
  written in the SAME atomic manifest write as the append's stats
  (``lineage_extra``) — an acknowledged commit can never lose its tag,
  and a replayed acknowledged batch is skipped: exactly-once for every
  batch whose append completed;
* the residual window is a crash MID-append (some files written,
  manifest not): on restart the replay either raises the column-mode
  id guard (docs already landed — loud, not silent) or re-appends
  orphan postings whose manifest never committed.  Run
  ``maintenance.repair()`` before restarting a stream after a
  mid-append crash — the same torn-commit discipline as any
  file-append lake writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from searchlite_spark.index.append import append_documents
from searchlite_spark.index.catalog import Index


def apply_stream_batch(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    id_mode: str = "assign",
    num_partitions: int | None = None,
) -> bool:
    """Commit one micro-batch; returns True if applied, False if the
    batch id is at/below the recorded watermark (replay skip).  The
    watermark rides in the append's own atomic manifest write."""
    idx = Index(path=index_path, spark=spark)
    mark = (idx.manifest.get("lineage") or {}).get("stream_max_batch")
    if mark is not None and int(batch_id) <= int(mark):
        return False
    if batch_df.isEmpty():
        return False
    append_documents(
        spark,
        idx,
        batch_df,
        num_partitions=num_partitions,
        id_mode=id_mode,
        lineage_extra={"stream_max_batch": int(batch_id)},
    )
    return True


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
        apply_stream_batch(
            spark, index_path, batch_df, batch_id,
            id_mode=id_mode, num_partitions=num_partitions,
        )

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
