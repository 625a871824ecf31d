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
