"""Build-pipeline semantics on the synthetic table: dangling refs dropped,
self-links dropped, duplicates deduped, aliases resolved, ids dense."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikipath_spark.plans.build import build_graph
from wikipath_spark.sources.synthetic import (
    expected_alias_resolution,
    synthetic_repos,
)


@pytest.fixture(scope="module")
def graph(spark):
    repos = synthetic_repos(spark, classes_per_repo=100, repos=2)
    g = build_graph(spark, repos, with_stats=True)
    g.edges = g.edges.persist()
    return g


def test_counts(graph):
    # 2 repos × 100 classes × 3 langs; 8 alias roles per 100 classes
    assert graph.stats["pages"] == 600
    assert graph.stats["aliases"] == 48


def test_ids_dense(graph):
    n = graph.pages.count()
    agg = graph.pages.agg(
        F.min("page_id").alias("lo"),
        F.max("page_id").alias("hi"),
        F.countDistinct("page_id").alias("d"),
    ).collect()[0]
    assert (agg.lo, agg.hi, agg.d) == (0, n - 1, n)


def test_compressed_aliases_match_oracle(spark, graph):
    """The surviving alias map must be exactly the chain roles 90,91,92 → 95
    per class group (expected_alias_resolution), for every repo and lang."""
    exp = expected_alias_resolution(100)
    surviving = {q for q, t in exp.items() if t is not None}
    # join redirects back to paths
    p = graph.pages.select("page_id", "repo", "path")
    r = (
        graph.redirects.join(p.withColumnRenamed("page_id", "src"), "src")
        .withColumnRenamed("path", "src_path")
        .withColumnRenamed("repo", "src_repo")
        .join(
            graph.pages.select(F.col("page_id").alias("dst"), F.col("path").alias("dst_path")),
            "dst",
        )
        .collect()
    )
    # every surviving redirect flattens a chain class to mod{…95…}
    assert len(r) == len(surviving) * 3 * 2  # roles × langs × repos
    for row in r:
        src_mod = int(row.src_path.split("mod")[1].split(".")[0])
        dst_mod = int(row.dst_path.split("mod")[1].split(".")[0])
        q_src, q_dst = src_mod // 3, dst_mod // 3
        assert q_src % 100 in (90, 91, 92)
        assert exp[q_src] == q_dst


def test_no_self_edges_no_dupes(graph):
    assert graph.edges.filter("src = dst").count() == 0
    n = graph.edges.count()
    assert graph.edges.dropDuplicates(["src", "dst"]).count() == n


def test_no_dangling_endpoints(graph):
    ids = graph.pages.select("page_id")
    for c in ("src", "dst"):
        bad = graph.edges.join(ids, graph.edges[c] == ids["page_id"], "left_anti")
        assert bad.count() == 0


def test_no_edges_into_compressed_alias_sources(graph):
    """After resolution no edge may point at a surviving alias source —
    those pages were compressed away as link targets (parse.rs:360-361)."""
    srcs = graph.redirects.select(F.col("src").alias("page_id"))
    assert graph.edges.join(srcs, graph.edges["dst"] == srcs["page_id"], "left_semi").count() == 0


def test_hub_skew_present(graph):
    """Per-lang hub (class 0) must dominate in-degree — the skew fixture."""
    deg = graph.edges.groupBy("dst").count()
    top = deg.orderBy(F.desc("count")).limit(6).collect()
    med = deg.approxQuantile("count", [0.5], 0.0)[0]
    assert top[0]["count"] > 10 * med
