"""Physical-plan assertions: the optimizations SURVEY.md §4 claims Catalyst
gives for free must actually appear in the plans — predicate pushdown to the
parquet scan, broadcast joins for small dims, column pruning, and no
whole-table Python round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from wikipath_spark.functions.text import ci_equal, fold_accents

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    df = entrymod.q_filtered_revenue(spark, SF)
    plan = _plan(df)
    assert "PushedFilters" in plan
    # both predicates pushed into the parquet scan
    assert "l_discount" in plan.split("PushedFilters")[1][:300]
    assert "l_quantity" in plan.split("PushedFilters")[1][:300]


def test_small_dims_broadcast(spark):
    df = entrymod.q_customer_nation_region(spark, SF)
    assert "BroadcastHashJoin" in _plan(df)


def test_column_pruning(spark):
    # text_stats touches only doc_id + text: the scan must not read lang/source
    df = entrymod.q_text_stats(spark, SF)
    plan = _plan(df)
    scan = plan.split("ReadSchema")[1].splitlines()[0]
    assert "text" in scan and "doc_id" in scan
    assert "n_chars" not in scan and "source" not in scan


def test_map_side_partial_aggregation(spark):
    # partial_sum before the exchange = map-side combine: shuffle carries
    # one row per (partition, group), not per input row
    df = entrymod.q_pricing_summary(spark, SF)
    plan = _plan(df)
    # the tree prints top-down: HashAggregate(partial) sits BELOW the
    # Exchange node in the tree == executes before it
    assert "partial_sum" in plan and "Exchange" in plan


def test_lsh_bucket_is_codegen_flat(spark):
    """Hyperplane buckets must be flat scalar expressions — no interpreted
    higher-order array lambdas in the bucket derivation (measured 5-10×)."""
    from wikipath_spark.operators.similarity import add_lsh_bucket

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(add_lsh_bucket(emb, "embedding", planes=4).select("bucket"))
    assert "lambdafunction" not in plan.lower()
    assert "[codegen id :" in plan  # the projection runs inside codegen


def test_minhash_signatures_single_arrow_eval(spark):
    """The Arrow signature kernel crosses to Python exactly once."""
    df = entrymod.q_minhash_signatures(spark, SF)
    plan = _plan(df)
    # one physical node: the detail section prints "ArrowEvalPython (<id>)"
    assert plan.count("ArrowEvalPython (") == 1


def test_simhash_stays_jvm_side(spark):
    """SimHash fingerprints are pure JVM — no Python in the hot path."""
    plan = _plan(entrymod.q_simhash(spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_exact_topk_is_one_arrow_pass(spark):
    """Exact cosine top-k (round 6): the query side ships in the kernel
    closure and ONE Arrow pass streams the corpus — no join at all, so no
    shuffle of |Q|×|C| pairs can exist; the only exchange is the final
    per-query top-k window over the kernel's guarded survivors."""
    plan = _plan(entrymod.q_cosine_topk(spark, SF))
    assert "MapInPandas" in plan
    assert "Join" not in plan
    # exactly one exchange: the window's hashpartitioning(query_id)
    assert plan.count("+- Exchange") == 1 and "hashpartitioning(query_id" in plan


def test_ci_equal(spark):
    df = spark.createDataFrame(
        [("Álvarez", "alvarez", True), ("École", "ecole", True), ("abc", "abd", False)],
        "a string, b string, want boolean",
    )
    rows = df.select(ci_equal(F.col("a"), F.col("b")).alias("got"), "want").collect()
    assert all(r.got == r.want for r in rows)
    assert df.select(fold_accents(F.lit("ñandú")).alias("x")).collect()[0].x == "nandu"


def test_event_time_sessions_pushdown_and_pruning(spark):
    """events_sessions (session_window over the events table): the null-ts
    filter must reach the parquet scan as a pushed filter and the scan must
    read only the three referenced columns (not the 6-column table)."""
    plan = _plan(entrymod.q_events_sessions(spark, SF))
    assert "IsNotNull(ts)" in plan          # PushedFilters
    assert "event_type" not in plan and "props" not in plan  # column pruning
