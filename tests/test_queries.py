"""Side-by-side cross-check of every ``queries()`` entry against its
``oracle_sql()`` DuckDB twin at sf0.001 — a local replica of the driver's
correctness gate (row count + schema + order-insensitive value comparison,
columns sorted by name)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.9g}"
    if val is None:
        return "␀"
    return str(val)


def _rows(cols_sorted, records):
    out = []
    for rec in records:
        out.append(tuple(_canon(rec[c]) for c in cols_sorted))
    return sorted(out)


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, SF_DIR)
    spark_recs = [r.asDict() for r in sdf.collect()]
    con = _duck()
    ddf = con.sql(ORACLE[name])
    dcols = ddf.columns
    drecs = [dict(zip(dcols, row)) for row in ddf.fetchall()]

    assert sorted(sdf.columns) == sorted(dcols), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(dcols)}"
    )
    cols = sorted(sdf.columns)
    s_rows, d_rows = _rows(cols, spark_recs), _rows(cols, drecs)
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must run and return stable schemas."""
    for name, fn in QUERIES.items():
        if name in ORACLE:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
        assert df.columns, name
