"""PageRank golden tests: tiny hand-checkable graphs (FIXTURES.md §4) against
the pure-numpy power-iteration oracle (allclose 1e-6), both physical
strategies (sql hash-agg and CSR applyInPandas), salted aggregation, and
determinism across parallelism levels."""

from __future__ import annotations

import numpy as np
import pytest

from wikipath_spark.operators.pagerank import pagerank, pagerank_numpy_oracle

GRAPHS = {
    "path4": [(1, 2), (2, 3), (3, 4)],
    "diamond": [(1, 2), (1, 3), (2, 4), (3, 4)],
    "cycle3": [(1, 2), (2, 3), (3, 1)],
    "star_hub": [(i, 0) for i in range(1, 10)],
    "two_cc": [(1, 2), (2, 3), (10, 11)],
    "k4": [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b],
    "dangling": [(1, 2), (2, 3)],  # 3 has no out-edges
}


def _check(edges_df, edge_list, **kw):
    res = pagerank(edges_df(edge_list), **kw)
    got = {r.page_id: r.rank for r in res.ranks.collect()}
    oracle = pagerank_numpy_oracle(edge_list)
    assert set(got) == set(oracle)
    for k in got:
        assert got[k] == pytest.approx(oracle[k], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    return res


@pytest.mark.parametrize("name", list(GRAPHS))
def test_pagerank_sql(edges_df, name):
    _check(edges_df, GRAPHS[name], impl="sql")


@pytest.mark.parametrize("name", ["diamond", "star_hub"])
def test_pagerank_csr(edges_df, name):
    _check(edges_df, GRAPHS[name], impl="csr")


def test_pagerank_salted(edges_df):
    _check(edges_df, GRAPHS["star_hub"], salt_partials=4)


def test_pagerank_deterministic_across_parallelism(spark, edges_df):
    """Same scores whatever the shuffle-partition count (parallelism proxy)."""
    el = GRAPHS["k4"] + GRAPHS["two_cc"] + [(4, 10)]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        r2 = {r.page_id: r.rank for r in pagerank(edges_df(el)).ranks.collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        r8 = {r.page_id: r.rank for r in pagerank(edges_df(el)).ranks.collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert set(r2) == set(r8)
    np.testing.assert_allclose(
        [r2[k] for k in sorted(r2)], [r8[k] for k in sorted(r8)], atol=1e-9
    )
