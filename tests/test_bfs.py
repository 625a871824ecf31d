"""Bidirectional-BFS parity tests.

``_bfs_oracle`` is a pure-Python behavioral oracle implementing exactly the
reference's search semantics (search.rs:23-217): strictly-smaller queue
expands (ties → backward), level-synchronous predecessor merging, overlap =
newly-discovered ∩ other-side-visited, count = Σ fwd×bwd over the overlap
set, length = fwd_depth + bwd_depth (0 when count 0).
"""

from __future__ import annotations

import random

import pytest

from wikipath_spark.operators.bfs import Paths, enumerate_paths, shortest_paths


def _bfs_oracle(edge_list, source, target):
    out: dict[int, set[int]] = {}
    inc: dict[int, set[int]] = {}
    for a, b in edge_list:
        out.setdefault(a, set()).add(b)
        inc.setdefault(b, set()).add(a)

    if source == target:
        return {"length": 0, "count": 1, "links": {}}

    fq, bq = [source], [target]
    fpred: dict[int, set[int]] = {source: set()}
    bpred: dict[int, set[int]] = {target: set()}
    fd = bd = 0
    overlap: set[int] = set()
    while not overlap and fq and bq:
        newp: dict[int, set[int]] = {}
        if len(fq) < len(bq):
            nxt = []
            for u in fq:
                for v in out.get(u, ()):  # ascending not needed: set semantics
                    if v not in fpred:
                        nxt.append(v)
                        newp.setdefault(v, set()).add(u)
                        if v in bpred:
                            overlap.add(v)
            for child, preds in newp.items():
                fpred.setdefault(child, set()).update(preds)
            fq = nxt
            fd += 1
        else:
            nxt = []
            for u in bq:
                for v in inc.get(u, ()):
                    if v not in bpred:
                        nxt.append(v)
                        newp.setdefault(v, set()).add(u)
                        if v in fpred:
                            overlap.add(v)
            for child, preds in newp.items():
                bpred.setdefault(child, set()).update(preds)
            bq = nxt
            bd += 1

    links: dict[int, set[int]] = {}
    count = 0
    fmem: dict[int, int] = {}
    bmem: dict[int, int] = {}

    def count_paths(v, end, preds, mem, fwd):
        if v == end:
            return 1
        total = 0
        for p in preds[v]:
            if fwd:
                links.setdefault(p, set()).add(v)
            else:
                links.setdefault(v, set()).add(p)
            if p in mem:
                total += mem[p]
            else:
                r = count_paths(p, end, preds, mem, fwd)
                mem[p] = r
                total += r
        return total

    for page in overlap:
        fc = count_paths(page, source, fpred, fmem, True)
        bc = count_paths(page, target, bpred, bmem, False)
        count += fc * bc
    return {
        "length": (fd + bd) if count else 0,
        "count": count,
        "links": {k: sorted(v) for k, v in sorted(links.items())},
    }


FIXTURES = [
    ("path4", [(1, 2), (2, 3), (3, 4)], 1, 4, 3, 1),
    ("diamond", [(1, 2), (1, 3), (2, 4), (3, 4)], 1, 4, 2, 2),
    ("cycle3", [(1, 2), (2, 3), (3, 1)], 1, 3, 2, 1),
    ("two_cc_nopath", [(1, 2), (2, 3), (10, 11)], 1, 10, 0, 0),
    ("star_no_path", [(i, 0) for i in range(1, 10)], 3, 5, 0, 0),
    (
        "bidi_meet",
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 7), (7, 4)],
        1,
        6,
        4,
        1,
    ),
]


@pytest.mark.parametrize("name,el,s,t,length,count", FIXTURES, ids=[f[0] for f in FIXTURES])
def test_bfs_golden(edges_df, name, el, s, t, length, count):
    got = shortest_paths(edges_df(el), s, t)
    assert (got.length, got.count) == (length, count)
    oracle = _bfs_oracle(el, s, t)
    assert got.count == oracle["count"] and got.length == oracle["length"]
    assert got.links == oracle["links"]


def test_bfs_same_source_target(edges_df):
    got = shortest_paths(edges_df([(1, 2)]), 1, 1)
    assert (got.length, got.count) == (0, 1)


def test_bfs_redirect_resolution(spark, edges_df):
    redirects = spark.createDataFrame([(5, 1)], "src long, dst long")
    got = shortest_paths(edges_df([(1, 2)]), 5, 2, redirects=redirects)
    assert got.source == 1 and got.source_is_redirect
    assert got.target == 2 and not got.target_is_redirect
    assert (got.length, got.count) == (1, 1)


def test_bfs_random_vs_oracle(edges_df):
    rng = random.Random(123)
    el = list({(rng.randrange(40), rng.randrange(40)) for _ in range(160)})
    el = [(a, b) for a, b in el if a != b]
    df = edges_df(el)
    for s, t in [(0, 39), (1, 20), (5, 5), (3, 17), (10, 30)]:
        got = shortest_paths(df, s, t)
        oracle = _bfs_oracle(el, s, t)
        assert (got.length, got.count) == (oracle["length"], oracle["count"]), (s, t)
        assert got.links == oracle["links"], (s, t)


def test_enumerate_paths_diamond():
    p = Paths(1, False, 4, False, links={1: [2, 3], 2: [4], 3: [4]}, length=2, count=2)
    assert enumerate_paths(p) == [[1, 2, 4], [1, 3, 4]]
    assert enumerate_paths(p, max_paths=1) == [[1, 2, 4]]
