"""Stateful-streaming sessionization test: drive a two-batch file stream,
let the processing-time gap fire, and check the emitted sessions."""

from __future__ import annotations

import time

import pytest


def test_stateful_sessionization(spark, tmp_path):
    from wikipath_spark.streaming.sessions import sessionize_stream

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    batch1 = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:01:00", 2.0),
            (2, "2024-01-01 09:00:00", 5.0),
        ],
        "user_id long, ts_s string, value double",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
    batch1.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(str(src))
    q = (
        sessionize_stream(stream, gap_ms=2000)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait past the gap; empty triggers advance processing time and fire
        # the timeout, emitting both users' sessions
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.table("sessions_out").collect()
            if len(rows) >= 2:
                break
            time.sleep(2)
        got = {r.user_id: (r.n_events, r.sum_value, r.session_start, r.session_end) for r in rows}
        assert set(got) == {1, 2}
        n1, s1, st1, en1 = got[1]
        assert (n1, s1) == (2, 3.0)
        assert st1.minute == 0 and en1.minute == 1
        assert got[2][0] == 1 and got[2][1] == 5.0
    finally:
        q.stop()


def test_event_time_sessionization_stream_matches_batch(spark, tmp_path):
    """EVENT-time sessions (session_window + watermark): a late event inside
    the watermark merges into its proper session — impossible under the
    processing-time variant — and the streamed append output equals the
    batch run of the SAME definition over the closed sessions."""
    from wikipath_spark.streaming.sessions import sessionize_event_time

    src = tmp_path / "et_stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "et_ckpt")
    schema = "user_id long, ts timestamp, value double"

    def write(rows):
        spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value").coalesce(
            1
        ).write.mode("append").parquet(str(src))

    write(
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 13:00:00", 4.0),
            (2, "2024-01-01 09:00:00", 5.0),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = (
        sessionize_event_time(stream, gap_s=3600, watermark="6 hours")
        .writeStream.format("memory")
        .queryName("et_sessions_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:  # batch 1 ingested (nothing closed yet)
            if any(p["numInputRows"] >= 3 for p in (q.recentProgress or [])):
                break
            time.sleep(1)
        # late event 10:30 is 6h-watermark-safe and must MERGE into the
        # 10:00 session; the day-2 sentinel advances the watermark to
        # day2-6h = 18:00, closing every day-1 session
        write([(1, "2024-01-01 10:30:00", 2.0), (99, "2024-01-02 00:00:00", 0.0)])
        rows = []
        while time.time() < deadline:
            rows = spark.table("et_sessions_out").collect()
            if len(rows) >= 3:
                break
            time.sleep(2)
        streamed = sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
            for r in rows
        )
        batch_df = sessionize_event_time(
            spark.read.schema(schema).parquet(str(src)), gap_s=3600
        )
        batch = sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
            for r in batch_df.collect()
            if r.user_id != 99  # sentinel session is still open in the stream
        )
        assert streamed == batch
        assert streamed == [
            (1, "2024-01-01 10:00:00", "2024-01-01 10:30:00", 2, 3.0),
            (1, "2024-01-01 13:00:00", "2024-01-01 13:00:00", 1, 4.0),
            (2, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1, 5.0),
        ]
    finally:
        q.stop()
