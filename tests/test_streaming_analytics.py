"""Streaming analytics: watermarked windowed aggregation (late rows
beyond the watermark are dropped, not silently merged) and stateful
event-time sessionization via applyInPandasWithState (sessions close
when the watermark passes last_event + gap)."""

import datetime as dt
import uuid

from pyspark.sql import functions as F

from searchlite_spark.streaming import sessionize, windowed_event_counts

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)

EVENT_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def _write(spark, rows, path):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _drain(q):
    q.processAllAvailable()


def test_windowed_counts_drop_late_rows(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("wstream_src"))
    sink = f"win_sink_{uuid.uuid4().hex[:8]}"

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = windowed_event_counts(
        stream, window="10 minutes", watermark="30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option(
            "checkpointLocation", str(tmp_path_factory.mktemp("wstream_ckpt"))
        )
        .start()
    )
    try:
        # batch 1: three clicks in the 10:00 window, one view at 10:12
        _write(
            spark,
            [
                (0, _mins(1), 1, "click", 1.0),
                (1, _mins(2), 1, "click", 2.0),
                (2, _mins(3), 2, "click", 3.0),
                (3, _mins(12), 2, "view", 4.0),
            ],
            src,
        )
        _drain(q)
        # batch 2: advance event time to 12:00 -> watermark 11:30
        _write(spark, [(4, _mins(120), 3, "view", 1.0)], src)
        _drain(q)
        # batch 3: a LATE click at 10:04 — its window (10:00-10:10)
        # closed long before the 11:30 watermark, so it must be dropped
        _write(spark, [(5, _mins(4), 1, "click", 99.0)], src)
        _drain(q)

        rows = spark.sql(
            f"SELECT * FROM {sink} WHERE event_type = 'click'"
        ).collect()
        # the 10:00-10:10 click window was emitted with 3 events and
        # NEVER updated by the late row (no row with n_events=4, and
        # sum_value never includes the late 99.0)
        assert any(
            r["n_events"] == 3 and abs(r["sum_value"] - 6.0) < 1e-9
            for r in rows
        )
        assert not any(r["n_events"] == 4 for r in rows)
        assert not any(r["sum_value"] > 50 for r in rows)
    finally:
        q.stop()


def test_windowed_counts_keys_and_values(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("wstream2_src"))
    sink = f"win2_sink_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = windowed_event_counts(
        stream,
        keys=("event_type", "user_id"),
        window="1 hour",
        watermark="1 hour",
        value_col=None,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option(
            "checkpointLocation", str(tmp_path_factory.mktemp("wstream2_ckpt"))
        )
        .start()
    )
    try:
        _write(
            spark,
            [
                (0, _mins(1), 1, "click", 1.0),
                (1, _mins(2), 1, "click", 1.0),
                (2, _mins(3), 2, "view", 1.0),
            ],
            src,
        )
        _drain(q)
        rows = {
            (r["event_type"], r["user_id"]): r["n_events"]
            for r in spark.sql(f"SELECT * FROM {sink}").collect()
        }
        assert rows[("click", 1)] == 2
        assert rows[("view", 2)] == 1
        assert "sum_value" not in spark.table(sink).columns
    finally:
        q.stop()


def test_sessionize_gap_and_timeout_close(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_src"))
    sink = f"sess_sink_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = sessionize(stream, gap_s=1800)  # 30-minute gap
    q = (
        sess.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path_factory.mktemp("sess_ckpt"))
        )
        .start()
    )
    try:
        # user 1: two events 10 min apart (one session), then a gap of
        # 2 hours inside the SAME user -> second session opens at 12:00
        _write(
            spark,
            [
                (0, _mins(0), 1, "click", 1.0),
                (1, _mins(10), 1, "click", 1.0),
                (2, _mins(5), 2, "view", 1.0),
            ],
            src,
        )
        _drain(q)
        # the in-batch gap close: user 1 events at 12:00 close the
        # 10:00-10:10 session immediately (gap > 30 min inside a batch)
        _write(spark, [(3, _mins(120), 1, "click", 1.0)], src)
        _drain(q)
        # advance the watermark far past 12:00 + gap so every open
        # session times out; one more batch lets the timeouts fire
        _write(spark, [(4, _mins(600), 9, "click", 1.0)], src)
        _drain(q)
        _write(spark, [(5, _mins(1200), 9, "click", 1.0)], src)
        _drain(q)

        rows = sorted(
            (
                (
                    r["user_id"],
                    r["session_start"],
                    r["session_end"],
                    r["n_events"],
                )
                for r in spark.sql(f"SELECT * FROM {sink}").collect()
            ),
        )
        by_user = {}
        for u, s, e, n in rows:
            by_user.setdefault(u, []).append((s, e, n))
        # user 1: first session 10:00-10:10 (2 events), second session
        # the single 12:00 event
        assert (T0, _mins(10), 2) in by_user[1]
        assert (_mins(120), _mins(120), 1) in by_user[1]
        # user 2: single-event session at 10:05
        assert by_user[2] == [(_mins(5), _mins(5), 1)]
    finally:
        q.stop()


def test_sessionize_late_event_extends_session_start(spark, tmp_path_factory):
    """An allowed-late event EARLIER than the open session's first seen
    event must pull session_start down (the reference gap-session
    semantics are order-independent); chunked groups must behave the
    same, so Arrow batches are shrunk to force multi-chunk delivery."""
    src = str(tmp_path_factory.mktemp("sess_late_src"))
    sink = f"sess_late_{uuid.uuid4().hex[:8]}"
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = sessionize(stream, gap_s=1800)  # 30-minute gap
    q = (
        sess.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(tmp_path_factory.mktemp("sess_late_ckpt")),
        )
        .start()
    )
    try:
        # batch 1: user 7's events written in DESCENDING time order so
        # the 3-row Arrow chunks arrive newest-first — a per-chunk sort
        # alone would fix chunk 1's start at 11:00 and never lower it
        _write(
            spark,
            [
                (0, _mins(60), 7, "click", 1.0),  # 11:00
                (1, _mins(55), 7, "click", 1.0),
                (2, _mins(50), 7, "click", 1.0),
                (3, _mins(45), 7, "click", 1.0),
                (4, _mins(40), 7, "click", 1.0),  # 10:40
            ],
            src,
        )
        _drain(q)
        # batch 2: a late-but-allowed event at 10:35 (watermark is
        # 11:00 - 30 min = 10:30) BEFORE the open session's start
        _write(spark, [(5, _mins(35), 7, "click", 1.0)], src)
        _drain(q)
        # advance the watermark well past 11:00 + gap, twice, so the
        # open session times out and is emitted
        _write(spark, [(6, _mins(600), 9, "click", 1.0)], src)
        _drain(q)
        _write(spark, [(7, _mins(1200), 9, "click", 1.0)], src)
        _drain(q)

        got = {
            (r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql(
                f"SELECT * FROM {sink} WHERE user_id = 7"
            ).collect()
        }
        assert got == {(_mins(35), _mins(60), 6)}
    finally:
        q.stop()
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_batch
        )
