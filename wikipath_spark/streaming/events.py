"""Structured Streaming over the events table.

The reference has no streaming (its only reactive piece is the 5s-debounced
DB-file watcher, serve.rs:155-192 — here that's just re-reading a newer
table snapshot).  This module adds the streaming surface a training-data
pipeline needs: windowed event aggregation with watermarked late-data
handling, plus the exact batch equivalent so streaming output is verifiable
against a SQL oracle.

``windowed_event_counts`` is written once against a DataFrame and works for
both batch and streaming inputs — the Structured Streaming contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per-(window, event_type) count + value sum; batch and streaming."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """File-source streaming variant with a watermark bounding agg state —
    the scale knob that keeps unbounded streams from unbounded memory."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return windowed_event_counts(stream.withWatermark("ts", watermark), window)


def run_stream_to_memory(
    spark: SparkSession, source_dir: str, schema: str, table_name: str = "windowed_counts"
) -> None:
    """Drive the stream to completion against a static dir (test harness):
    processes all available files, writes the final windowed counts to an
    in-memory table, and stops."""
    q = (
        stream_windowed_event_counts(spark, source_dir, schema)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    if q.isActive:
        q.stop()
