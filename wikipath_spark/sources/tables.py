"""Table IO: Iceberg-first with a transparent parquet fallback.

The reference persists to LMDB and compacts to a single serve file
(database.rs:273-296); our sinks are columnar tables.  When an Iceberg
catalog is configured on the session we use ``DataFrame.writeTo`` /
``spark.read.table``; otherwise identical-schema parquet under a base dir.
Engine code never branches on the format — it calls these helpers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        return False
    return "IcebergSparkSessionExtensions" in exts


def load_table(spark: SparkSession, base: str, name: str) -> DataFrame:
    """Read one table from a base dir (parquet) or catalog (Iceberg)."""
    if base.startswith("catalog:"):
        return spark.read.table(f"{base[len('catalog:'):]}.{name}")
    return spark.read.parquet(os.path.join(base, f"{name}.parquet"))


def load_tables(spark: SparkSession, base: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, base, n) for n in names}


def write_table(
    df: DataFrame,
    base: str,
    name: str,
    mode: str = "overwrite",
    sort_by: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """Write a derived table.

    ``sort_by`` applies write clustering (W2 — the reference's key-ordered
    LMDB writes, database.rs:252-264); ``coalesce`` is the small-file
    compaction analogue of database.rs:286-288.
    """
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    if coalesce:
        df = df.coalesce(coalesce)
    if base.startswith("catalog:"):
        ident = f"{base[len('catalog:'):]}.{name}"
        writer = df.writeTo(ident)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(os.path.join(base, f"{name}.parquet"))
