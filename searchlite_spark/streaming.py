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
  manifest not).  Because appends derive id assignment and the
  column-mode guard from the manifest's committed ``max_doc_id`` (not
  the torn files — see append.py), a replay would rewrite the SAME
  rows, and ``maintenance.repair()`` restores exactly the committed
  state by dropping everything above the high-water mark.  To keep the
  window loud instead of relying on discipline, the sink checks for
  torn state once per (re)start — docstore rows above the committed
  mark — and refuses to append until ``repair()`` has run.

``id_mode`` defaults to ``"column"`` (the batch carries its own BIGINT
ids): replays are then also guarded per-batch by the monotonic-id
check inside ``append_documents``.  ``id_mode="assign"`` is supported
for keyless sources; its torn-window protection is the start-of-stream
check + repair discipline above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from searchlite_spark.index.append import append_documents
from searchlite_spark.index.catalog import Index


class TornAppendError(RuntimeError):
    """The index contains rows above the manifest's committed
    ``max_doc_id`` high-water mark: a previous append crashed between
    the file writes and the manifest commit.  Run
    ``maintenance.repair()`` (writes a clean index) before appending."""


def check_no_torn_append(spark: SparkSession, index_path: str) -> None:
    """Raise TornAppendError if uncommitted (torn) rows exist.  One
    doc_id-column aggregate over the docstore — run at stream (re)start,
    not per batch."""
    idx = Index(path=index_path, spark=spark)
    committed = (idx.manifest.get("stats") or {}).get("max_doc_id")
    if committed is None:
        return  # legacy manifest without the mark: nothing to compare
    mx = idx.docs().agg(F.max("doc_id").alias("m")).first()["m"]
    if mx is not None and int(mx) > int(committed):
        raise TornAppendError(
            f"index at {index_path} has docstore rows up to doc_id {mx} "
            f"but the committed high-water mark is {committed}: a prior "
            "append was torn. Run searchlite_spark.index.maintenance."
            "repair() before appending."
        )


def apply_stream_batch(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    id_mode: str = "column",
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
    id_mode: str = "column",
    num_partitions: int | None = None,
    trigger: dict | None = None,
):
    """Start a streaming query appending every micro-batch to the index
    at ``index_path``.  ``stream_df`` must be a streaming DataFrame in
    the corpus schema; ``trigger`` defaults to ``availableNow`` (drain
    what exists, then stop) — pass e.g. ``{"processingTime": "1 minute"}``
    for continuous ingest.  Returns the StreamingQuery.

    Refuses to start over a torn index (see ``check_no_torn_append``) so
    a replayed batch can never land on top of uncommitted rows."""
    check_no_torn_append(spark, index_path)

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
