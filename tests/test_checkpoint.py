"""Checkpoint/resume: kill after superstep k, resume from the durable
checkpoint, and get the identical result (north-rule resumability)."""

from __future__ import annotations

import pytest

from wikipath_spark.operators.pagerank import pagerank
from wikipath_spark.plans.checkpoint import CheckpointManager

EDGES = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1), (4, 5), (5, 1), (2, 5), (6, 1)]


class _StopAfter(Exception):
    pass


def test_checkpoint_save_load_manifest(spark, edges_df, tmp_path):
    mgr = CheckpointManager(str(tmp_path), "run1")
    res = pagerank(edges_df(EDGES), checkpoint_mgr=mgr, checkpoint_interval=5)
    latest = mgr.latest()
    assert latest is not None
    state, metric = mgr.load(spark, latest)
    assert state.count() == 6
    m = mgr.manifest(latest, spark)
    assert set(m.columns) == {"run_id", "superstep", "part_id", "rows", "checksum", "metric"}
    row = m.agg({"rows": "sum"}).collect()[0]
    assert row[0] == 6
    assert metric == pytest.approx(res.delta) or metric >= res.delta


def test_resume_identical_to_uninterrupted(spark, edges_df, tmp_path):
    df = edges_df(EDGES)
    full = pagerank(df, max_iter=40)
    want = {r.page_id: r.rank for r in full.ranks.collect()}

    # interrupted run: checkpoint every 3 supersteps, abort after superstep 6
    mgr = CheckpointManager(str(tmp_path), "run2")

    def bomb(it, ranks, delta):
        if it >= 6:
            raise _StopAfter()

    with pytest.raises(_StopAfter):
        pagerank(df, max_iter=40, checkpoint_mgr=mgr, checkpoint_interval=3, on_superstep=bomb)
    assert mgr.latest() == 6

    resumed = pagerank(df, max_iter=40, checkpoint_mgr=mgr, checkpoint_interval=3, resume=True)
    got = {r.page_id: r.rank for r in resumed.ranks.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_cc_and_lpa_checkpoint_resume(spark, edges_df, tmp_path):
    from wikipath_spark.operators.components import connected_components
    from wikipath_spark.operators.labelprop import label_propagation

    el = [(i, i + 1) for i in range(30)] + [(100, 101), (101, 102)]
    df = edges_df(el)

    full_cc = {r.page_id: r.component for r in connected_components(df).collect()}
    mgr = CheckpointManager(str(tmp_path), "cc")
    connected_components(df, checkpoint_mgr=mgr, checkpoint_interval=2)
    assert mgr.latest() is not None
    resumed = {
        r.page_id: r.component
        for r in connected_components(df, checkpoint_mgr=mgr, resume=True).collect()
    }
    assert resumed == full_cc

    full_lpa = {r.page_id: r.label for r in label_propagation(df, max_iter=6).collect()}
    mgr2 = CheckpointManager(str(tmp_path), "lpa")
    label_propagation(df, max_iter=6, checkpoint_mgr=mgr2, checkpoint_interval=2)
    assert mgr2.latest() is not None
    resumed2 = {
        r.page_id: r.label
        for r in label_propagation(
            df, max_iter=6, checkpoint_mgr=mgr2, resume=True
        ).collect()
    }
    assert resumed2 == full_lpa


def test_corrupt_checkpoint_detected(spark, edges_df, tmp_path):
    mgr = CheckpointManager(str(tmp_path), "run3")
    pagerank(edges_df(EDGES), checkpoint_mgr=mgr, checkpoint_interval=5)
    latest = mgr.latest()
    # truncate the recorded row count to simulate corruption
    import json, os

    marker = os.path.join(str(tmp_path), "run3", f"superstep={latest}", "_COMMITTED")
    meta = json.load(open(marker))
    meta["rows"] += 1
    json.dump(meta, open(marker, "w"))
    with pytest.raises(ValueError, match="corrupt"):
        mgr.load(spark, latest)
