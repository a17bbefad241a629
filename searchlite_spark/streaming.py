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


# ---------------------------------------------------------------------------
# Streaming analytics: watermarked windowed aggregation + stateful
# sessionization.  The reference is a batch engine; these cover the
# "streams side" of a web-scale ingest pipeline: the same events table
# the batch aggregations query, consumed as a stream with late-data
# semantics declared ONCE (watermark) instead of hand-rolled reconcile
# jobs.


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Watermarked tumbling (or sliding, with ``slide``) window
    aggregation over an event stream: count + optional value sum per
    (window, *keys).

    Scale shape: state is ONE row per open (window, key) group —
    bounded by the watermark horizon, not the stream length — and the
    watermark lets Spark evict finalized windows and DROP late rows
    beyond ``watermark`` instead of buffering forever.  This is the
    streaming twin of the batch ``date_histogram``/``terms``
    aggregations in query/aggs.py; output columns are named so a batch
    DuckDB query over the same parquet can replay the same numbers.
    """
    w = F.window(F.col(ts_col), window, slide or window)
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def merge_session_intervals(
    intervals: list[tuple[int, int, int]], gap_ms: int
) -> list[tuple[int, int, int]]:
    """Merge ``(start_ms, end_ms, n_events)`` intervals whose gap is
    ``<= gap_ms`` into maximal sessions, returned in start order.

    This is the pure core of ``sessionize``: batch events enter as
    width-0 intervals and the open-session state as one wider interval,
    so the result is independent of event arrival order (Arrow chunk
    boundaries, allowed-late rows).  Property: for any multiset of
    timestamps, the output equals the offline gap-sessionization of the
    sorted multiset (and ``[] -> []``)."""
    if not intervals:
        return []
    ivs = sorted(intervals, key=lambda iv: (iv[0], iv[1]))
    out: list[tuple[int, int, int]] = []
    start_ms, end_ms, n = ivs[0]
    for s, e, c in ivs[1:]:
        if s - end_ms <= gap_ms:
            end_ms = max(end_ms, e)
            n += c
        else:
            out.append((start_ms, end_ms, n))
            start_ms, end_ms, n = s, e, c
    out.append((start_ms, end_ms, n))
    return out


def sessionize(
    stream_df: DataFrame,
    gap_s: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Event-time sessionization via ``applyInPandasWithState``: a
    session is a maximal run of one user's events with no gap larger
    than ``gap_s`` seconds; a CLOSED session row
    ``(user_id, session_start, session_end, n_events)`` is emitted once
    the event-time watermark passes ``session_end + gap``.

    Emission is watermark-exact, not merely gap-exact: a session
    separated from its successor by more than the gap is still held in
    state until ``end + gap < watermark``, because the watermark
    (delay = ``gap``) only guarantees future events arrive at
    ``>= max_event_time - gap`` — i.e. possibly BEFORE an already-gap-
    closed session's ``end + gap``, in which case they must merge into
    it (offline gap semantics).  State is therefore a LIST of open
    intervals (starts/ends/counts arrays); each batch merges state +
    events with the order-independent interval rule, emits the prefix
    provably safe under the watermark, and keeps the rest.  State per
    user stays bounded by the watermark horizon: an interval survives
    only while ``end + gap >= watermark``, so at most
    ``ceil(horizon/gap)`` intervals are ever held.

    This is the custom-stateful-operator pattern the built-in windowed
    aggregation can't express (variable-length windows keyed on
    inter-event gaps).  The watermark (delay = ``gap_s``) is declared
    here — feed the raw stream.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("starts", ArrayType(LongType())),
            StructField("ends", ArrayType(LongType())),
            StructField("ns", ArrayType(LongType())),
        ]
    )
    gap_ms = gap_s * 1000

    def _emit(uid, closed):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [uid] * len(closed),
                "session_start": [
                    pd.Timestamp(s, unit="ms") for s, _, _ in closed
                ],
                "session_end": [
                    pd.Timestamp(e, unit="ms") for _, e, _ in closed
                ],
                "n_events": [c for _, _, c in closed],
            }
        )

    def _split_and_store(state, merged, wm):
        """Partition merged intervals into (closeable now, still open)
        under watermark ``wm``, update/remove state, arm the timeout at
        the earliest possible close.  An interval is safe to close only
        when ``end + gap < wm``: Spark admits events with ts >= wm, and
        an event at exactly ``end + gap`` still merges."""
        closed = [iv for iv in merged if iv[1] + gap_ms < wm]
        open_ = [iv for iv in merged if iv[1] + gap_ms >= wm]
        if open_:
            state.update(
                (
                    [s for s, _, _ in open_],
                    [e for _, e, _ in open_],
                    [c for _, _, c in open_],
                )
            )
            # earliest close instant; must be strictly above the
            # current watermark to satisfy the state-store contract
            state.setTimeoutTimestamp(
                max(min(e + gap_ms for _, e, _ in open_), wm + 1)
            )
        else:
            state.remove()
        return closed

    def _fn(key, pdfs, state: GroupState):
        (uid,) = key
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            starts, ends, ns = state.get
            merged = list(zip(starts, ends, ns))
            closed = _split_and_store(state, merged, wm)
            if closed:
                yield _emit(uid, closed)
            return
        # Collect every chunk BEFORE sorting: a group larger than one
        # Arrow batch arrives as multiple pdfs with no cross-chunk
        # ordering guarantee, so per-chunk sorts are not enough.
        # Treat each open-session interval in state as one interval and
        # the batch events as width-0 intervals, then merge by start
        # order with the gap rule — this also repairs allowed-late
        # events that precede an open session's start (they extend it
        # downward or form their own earlier session) instead of being
        # glued onto a session that starts after them.
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(
                int(t) for t in pdf[ts_col].astype("int64") // 1_000_000
            )
        intervals = [(t, t, 1) for t in ts_all]
        if state.exists:
            starts, ends, ns = state.get
            intervals.extend(zip(starts, ends, ns))
        if not intervals:
            return
        merged = merge_session_intervals(intervals, gap_ms)
        closed = _split_and_store(state, merged, wm)
        if closed:
            yield _emit(uid, closed)

    return (
        stream_df.withWatermark(ts_col, f"{gap_s} seconds")
        .groupBy(F.col(user_col).cast("long").alias("user_id"))
        .applyInPandasWithState(
            _fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
