"""Iceberg-native path integration test — gated on the runtime jar.

The engine's table IO (sources/tables.py) is Iceberg-first with a parquet
fallback; the parquet branch is exercised throughout the suite, but the
native ``writeTo`` / ``MERGE INTO`` strings only execute when the Iceberg
Spark runtime is on the classpath.  This test runs them end-to-end in a
SUBPROCESS session (extensions must be set before SparkContext creation, so
the shared fixture session can't be reconfigured) and SKIPS with a clear
reason when the jar is absent — the sandbox ships without it, so the skip
itself is the documented state (COVERAGE.md)."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

ICEBERG_EXT = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def _iceberg_jar_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(ICEBERG_EXT)
        return True
    except Exception:
        return False


def test_iceberg_native_write_and_merge(spark, tmp_path):
    if not _iceberg_jar_available(spark):
        pytest.skip(
            "iceberg runtime jar not on classpath — native writeTo/MERGE INTO "
            "cannot execute here; the parquet fallback branch is covered by "
            "test_round2/test_round3 merge tests (see COVERAGE.md)"
        )
    script = textwrap.dedent(
        f"""
        from pyspark.sql import SparkSession
        from wikipath_spark.sources.tables import write_table, merge_upsert, load_table

        wh = {str(tmp_path / "wh")!r}
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("iceberg-native-test")
            .config("spark.sql.extensions", "{ICEBERG_EXT}")
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", wh)
            .getOrCreate()
        )
        base = "catalog:local.db"
        df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        write_table(df, base, "t")
        updates = spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string")
        merge_upsert(spark, base, "t", updates, ["k"])
        got = sorted(tuple(r) for r in load_table(spark, base, "t").collect())
        assert got == [(1, "a"), (2, "b2"), (3, "c")], got
        print("ICEBERG_OK")
        """
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300, env=env
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ICEBERG_OK" in proc.stdout
