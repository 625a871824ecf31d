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


def _orderable(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    return True


def dedup_events(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Batch semantics twin: first row per key wins — the row with the
    MINIMUM non-null ``ts_col``, ties broken by ``tie_break`` (default: every
    remaining orderable column, schema order).  Deterministic across
    parallelism levels, unlike ``dropDuplicates`` (which keeps an arbitrary
    partition-order-dependent row).

    Null timestamps sort AFTER all non-null ones: a null-``ts`` row is kept
    only when every row for the key has a null timestamp.  Non-orderable
    columns (maps, or structs/arrays containing maps) are excluded from the
    ordering but carried through on the keeper row — rows identical on all
    orderable columns and differing only in map columns tie arbitrarily."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    if tie_break is None:
        tie_break = [c for c in df.columns if c != ts_col and _orderable(schema[c])]
    else:
        missing = [c for c in tie_break if c not in schema]
        if missing:
            raise ValueError(f"dedup_events: unknown tie_break columns {missing}")
        bad = [c for c in tie_break if not _orderable(schema[c])]
        if bad:
            raise ValueError(f"dedup_events: non-orderable tie_break columns {bad}")
    ts = F.col(ts_col)
    order = F.struct(
        ts.isNull().alias("_null_ts"),
        ts.alias("_ts"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(tie_break)],
    )
    keeper = F.min_by(F.struct(*[F.col(c) for c in df.columns]), order).alias("_k")
    return (
        df.groupBy(*key_cols)
        .agg(keeper)
        .select(*[F.col(f"_k.{c}").alias(c) for c in df.columns])
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
