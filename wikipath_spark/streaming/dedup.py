"""Streaming deduplication — the ingest-side twin of operators/dedup.py.

A training-data pipeline dedups at ingest as well as at rest: this module
drops exact duplicates from an unbounded stream with BOUNDED state, using
``dropDuplicatesWithinWatermark`` — a duplicate arriving within the
watermark horizon of its first sighting is dropped; state for keys older
than the horizon is evicted, so memory is proportional to the horizon's key
cardinality, not the stream's history.  (Plain ``dropDuplicates`` on a
stream keeps every key forever — the unbounded-state trap.)

The key is a content digest (sha256 by default) rather than the payload
itself, so state rows stay fixed-width no matter how large documents get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_content_key(df: DataFrame, text_col: str = "text", out: str = "content_key") -> DataFrame:
    """Fixed-width dedup key: sha256 of the payload (S3's digest reused)."""
    return df.withColumn(out, F.sha2(F.col(text_col), 256))


def dedup_events(df: DataFrame, key_cols: list[str], ts_col: str = "ts") -> DataFrame:
    """Batch semantics twin: first row per key wins — the MINIMUM ``ts_col``
    row, ties broken by the full remaining row (min struct).  Deterministic
    across parallelism levels, unlike ``dropDuplicates`` (which keeps an
    arbitrary partition-order-dependent row)."""
    other = [c for c in df.columns if c != ts_col]
    keeper = F.min(F.struct(F.col(ts_col), *[F.col(c) for c in other])).alias("_k")
    return (
        df.groupBy(*key_cols)
        .agg(keeper)
        .select(*key_cols, *[F.col(f"_k.{c}") for c in [ts_col] + other if c not in key_cols])
        .select(*df.columns)
    )


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    key_cols: list[str],
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded streaming dedup over a file source."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(key_cols)


def run_stream_dedup_to_memory(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    key_cols: list[str],
    table_name: str = "deduped",
    horizon: str = "1 hour",
) -> None:
    """Drive the dedup stream over a static dir to completion (test harness)."""
    q = (
        stream_dedup(spark, source_dir, schema, key_cols, horizon=horizon)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    if q.isActive:
        q.stop()
