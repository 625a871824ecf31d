"""Skew helpers and synthetic-edge determinism tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipath_spark.operators.skew import degree_histogram, pick_salt, salted_sum
from wikipath_spark.sources.synthetic import synthetic_edges


def test_salted_sum_exact(spark):
    rows = [(1, float(i)) for i in range(100)] + [(2, 1.0), (3, 2.5)]
    df = spark.createDataFrame(rows, "k long, v double")
    plain = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r.k: r.total for r in salted_sum(df, "k", "v", salt=8, out="total").collect()}
    assert salted.keys() == plain.keys()
    for k in plain:
        assert abs(salted[k] - plain[k]) < 1e-9


def test_degree_histogram_and_salt(spark, edges_df):
    el = [(i, 0) for i in range(64)] + [(1, 2), (3, 4)]
    e = edges_df(el)
    hist = {r.bucket: (r.vertices, r.max_deg) for r in degree_histogram(e).collect()}
    assert hist[6] == (1, 64)  # the hub: 2^6 = 64 in-degree
    # sample_mod=1 = exact degree scan: ceil(64/10) partial groups
    assert pick_salt(e, rows_per_task=10, sample_mod=1) == 7
    # default 1% hash-sample: a 66-edge graph has no salting-scale hubs —
    # the estimator only needs to resolve degrees near rows_per_task
    assert pick_salt(e, rows_per_task=5_000_000) == 1


def test_synthetic_edges_deterministic(spark):
    a = synthetic_edges(spark, 1000, 10000, partitions=4)
    b = synthetic_edges(spark, 1000, 10000, partitions=16)
    ha = a.agg(F.count("*"), F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1 << 40)))).collect()[0]
    hb = b.agg(F.count("*"), F.sum(F.pmod(F.xxhash64("src", "dst"), F.lit(1 << 40)))).collect()[0]
    assert tuple(ha) == tuple(hb)
    assert a.filter("src = dst").count() == 0
    # hub skew present: hubs get ~E/(mod*n_hubs) extra on top of ~E/V spread
    top = a.groupBy("dst").count().orderBy(F.desc("count")).limit(1).collect()[0]["count"]
    med = a.groupBy("dst").count().approxQuantile("count", [0.5], 0.0)[0]
    assert top > 2 * med
