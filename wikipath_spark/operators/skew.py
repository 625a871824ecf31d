"""Skew-mitigation helpers for power-law keys.

AQE's skew handling covers *joins* only; a ``groupBy`` on a power-law ``dst``
(hub vertices — the Wikipedia-style in-degree distribution the reference's
adjacency lists embody, database.rs:225-243) still lands a hub's entire
in-neighborhood in one task.  ``salted_sum`` turns that into two stages:
partial aggregation over ``(key, salt)`` — spreading a hub across ``salt``
tasks — then a final aggregation over ``key`` with at most ``salt`` rows per
hub.  For algebraic aggregates (sum/count/min/max) this is exact.

``degree_histogram`` sizes the salt factor from the actual distribution
(SURVEY.md §4.2: choose S from the degree histogram, computed once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    salt: int,
    out: str = "sum",
    salt_source: str | None = None,
) -> DataFrame:
    """Exact two-stage sum of ``value`` by ``key`` with salt-spread partials.

    ``salt_source``: column whose hash picks the salt bucket.  Callers should
    pass a row-distinct deterministic column (e.g. the message's src vertex in
    PageRank): hashing the *value* (the fallback when no source is given)
    degenerates when a hub's values are all equal — every row lands in one
    bucket and no spreading happens.  ``spark_partition_id`` would spread but
    varies across parallelism levels, breaking bit-identical floating sums.
    """
    seed_col = F.col(salt_source) if salt_source else F.col(value)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key), seed_col), F.lit(salt)))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))


def degree_histogram(edges: DataFrame, key: str = "dst") -> DataFrame:
    """log2-bucketed degree histogram — one small aggregate used to pick the
    salt factor (hubs ⇒ max bucket ≫ median bucket)."""
    deg = edges.groupBy(key).agg(F.count("*").alias("deg"))
    return (
        deg.withColumn("bucket", F.floor(F.log2("deg")))
        .groupBy("bucket")
        .agg(F.count("*").alias("vertices"), F.max("deg").alias("max_deg"))
        .orderBy("bucket")
    )


def pick_salt(
    edges: DataFrame,
    key: str = "dst",
    rows_per_task: int = 5_000_000,
    sample_mod: int = 100,
) -> int:
    """Salt factor = ceil(estimated_max_degree / rows_per_task), ≥1.

    The max in-degree is estimated on a deterministic 1/``sample_mod``
    hash-sample of the edges (xxhash64 row filter — partitioning-independent,
    unlike ``DataFrame.sample``'s per-partition RNG streams, so the chosen
    salt — and therefore the floating-point sum grouping — is identical at
    any parallelism).  A full groupBy(max) would shuffle every edge just to
    size the salt (measured ~15% of a 12-superstep run); the sample shuffles
    1% and still sees any hub above the salting threshold tens of thousands
    of times.  Only degrees near ``rows_per_task`` matter, and those are
    estimated within ~1%."""
    cols = [F.col(c) for c in edges.columns]
    sampled = edges.filter(F.pmod(F.xxhash64(*cols), F.lit(sample_mod)) == 0)
    row = sampled.groupBy(key).agg(F.count("*").alias("deg")).agg(F.max("deg")).collect()[0]
    max_deg = (row[0] or 0) * sample_mod
    return max(1, -(-max_deg // rows_per_task))
