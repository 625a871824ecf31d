"""Golden tests for CC / LPA / triangles on hand-checkable graphs
(FIXTURES.md §4) plus randomized cross-checks against pure-Python oracles."""

from __future__ import annotations

import random

import pytest

from wikipath_spark.operators.components import connected_components
from wikipath_spark.operators.labelprop import label_propagation
from wikipath_spark.operators.triangles import triangle_count, triangles_per_vertex

GRAPHS = {
    "path4": [(1, 2), (2, 3), (3, 4)],
    "cycle3": [(1, 2), (2, 3), (3, 1)],
    "star_hub": [(i, 0) for i in range(1, 10)],
    "two_cc": [(1, 2), (2, 3), (10, 11)],
    "k4": [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b],
}


def _cc_oracle(edge_list):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize("name", list(GRAPHS))
def test_cc_golden(edges_df, name):
    el = GRAPHS[name]
    got = {r.page_id: r.component for r in connected_components(edges_df(el)).collect()}
    assert got == _cc_oracle(el)


def test_cc_random_vs_unionfind(edges_df):
    rng = random.Random(42)
    el = list({(rng.randrange(80), rng.randrange(80)) for _ in range(120)})
    el = [(a, b) for a, b in el if a != b]
    got = {r.page_id: r.component for r in connected_components(edges_df(el)).collect()}
    assert got == _cc_oracle(el)


def test_cc_long_chain(edges_df):
    el = [(i, i + 1) for i in range(40)]
    got = {r.page_id: r.component for r in connected_components(edges_df(el)).collect()}
    assert got == {i: 0 for i in range(41)}


def test_lpa_k4_single_label(edges_df):
    got = {r.page_id: r.label for r in label_propagation(edges_df(GRAPHS["k4"])).collect()}
    assert set(got.values()) == {1}


def test_lpa_deterministic(spark, edges_df):
    el = GRAPHS["two_cc"] + GRAPHS["k4"] + [(3, 10)]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = {r.page_id: r.label for r in label_propagation(edges_df(el)).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        b = {r.page_id: r.label for r in label_propagation(edges_df(el)).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_lpa_labels_stay_within_component(edges_df):
    el = GRAPHS["two_cc"]
    got = {r.page_id: r.label for r in label_propagation(edges_df(el)).collect()}
    assert set(got) == {1, 2, 3, 10, 11}
    assert {got[1], got[2], got[3]}.isdisjoint({got[10], got[11]})


TRI_GOLDEN = [("path4", 0), ("cycle3", 1), ("star_hub", 0), ("k4", 4), ("two_cc", 0)]


@pytest.mark.parametrize("name,expected", TRI_GOLDEN)
def test_triangle_count(edges_df, name, expected):
    assert triangle_count(edges_df(GRAPHS[name])) == expected


def test_triangles_per_vertex_k4(edges_df):
    got = {r.page_id: r.triangles for r in triangles_per_vertex(edges_df(GRAPHS["k4"])).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def _tri_oracle(edge_list):
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen = set()
    for u in adj:
        for v in adj[u]:
            for w in adj[u] & adj[v]:
                seen.add(tuple(sorted((u, v, w))))
    return len(seen)


def test_triangles_random(edges_df):
    rng = random.Random(7)
    el = list({(rng.randrange(30), rng.randrange(30)) for _ in range(150)})
    el = [(a, b) for a, b in el if a != b]
    assert triangle_count(edges_df(el)) == _tri_oracle(el)
