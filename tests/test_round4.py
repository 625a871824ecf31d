"""Round-4 regression tests: the round-3 ADVICE items (word_ngrams short-doc
crash, pagerank_fixedpoint source hygiene, dedup_events orderability, serve
LRU cap) plus the serve-path point-lookup shape (driver-side dict index —
LMDB point-read parity, reference database.rs:199-205)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikipath_spark.api import LinkGraphService
from wikipath_spark.operators.dedup import contamination_pairs, word_ngrams
from wikipath_spark.operators.pagerank import pagerank_fixedpoint
from wikipath_spark.plans.build import build_graph
from wikipath_spark.plans.catalog import DatasetCatalog
from wikipath_spark.sources.synthetic import synthetic_repos
from wikipath_spark.streaming.dedup import dedup_events


# --- word_ngrams: documents shorter than n must not crash (ADVICE high) ----


def test_word_ngrams_short_and_empty_docs(spark):
    # sequence(1, 0) is DESCENDING in Spark; un-guarded slice(toks, 0, n)
    # threw INVALID_PARAMETER_VALUE.START on any doc with < n tokens
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "exactly five tokens right here"),
         (4, "a b c d e f g")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.g for r in df.select(
        "doc_id", word_ngrams(F.col("text"), 5).alias("g")).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] == ["exactly five tokens right here"]
    assert len(out[4]) == 3


def test_contamination_tolerates_short_docs(spark):
    corpus = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, "shared five gram sequence here indeed")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(101, "shared five gram sequence here")], ["doc_id", "text"]
    )
    rows = contamination_pairs(corpus, bench, min_shared=1).collect()
    assert [(r.doc_id, r.bench_id) for r in rows] == [(3, 101)]


# --- dedup_events: non-orderable columns + null timestamps (ADVICE low) ----


def test_dedup_events_map_column_and_null_ts(spark):
    df = spark.createDataFrame(
        [(1, None, {"k": "x"}, "b"), (1, 5, {"k": "y"}, "a"),
         (1, 7, {"k": "z"}, "a"), (2, None, {"q": "w"}, "c")],
        "k int, ts int, m map<string,string>, v string",
    )
    out = {r.k: r for r in dedup_events(df, ["k"], "ts").collect()}
    # null ts sorts AFTER non-null: the ts=5 row wins for key 1
    assert out[1].ts == 5 and out[1].v == "a" and out[1].m == {"k": "y"}
    # a key whose rows are ALL null-ts still yields its (only) row
    assert out[2].ts is None and out[2].v == "c"


def test_dedup_events_rejects_non_orderable_tie_break(spark):
    df = spark.createDataFrame(
        [(1, 5, {"k": "y"})], "k int, ts int, m map<string,string>"
    )
    with pytest.raises(ValueError, match="non-orderable"):
        dedup_events(df, ["k"], "ts", tie_break=["m"])


# --- pagerank_fixedpoint source hygiene (ADVICE low) -----------------------


def test_personalized_pagerank_dedups_sources(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (3, 4)], ["src", "dst"])
    dup = sorted(map(tuple, pagerank_fixedpoint(e, sources=[2, 1, 1, 2]).collect()))
    ded = sorted(map(tuple, pagerank_fixedpoint(e, sources=[2, 1]).collect()))
    assert dup == ded


def test_personalized_pagerank_rejects_unknown_source(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    with pytest.raises(ValueError, match="not in the vertex set"):
        pagerank_fixedpoint(e, sources=[1, 999])


# --- serve path: driver-side point index + LRU pin cap ---------------------


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("warehouse_r4"))
    g = build_graph(spark, synthetic_repos(spark, classes_per_repo=100, repos=1))
    commit = g.pages.select("commit").first().commit
    cat = DatasetCatalog(spark, root)
    cat.save("repoA", commit, g)
    cat.save("repoB", commit, g)
    cat.save("repoC", commit, g)
    return cat, commit


def test_point_lookup_runs_zero_spark_jobs(spark, catalog):
    """Reference parity: a pinned small dataset serves title→id and id→title
    from a driver-side dict (LMDB B-tree point read, database.rs:199-205) —
    ZERO Spark jobs per probe, not even an in-memory columnar scan."""
    cat, commit = catalog
    svc = LinkGraphService(cat)
    ds = svc._open("repoA", commit)          # pin (runs jobs; outside group)
    assert ds.by_fkey is not None and ds.by_id is not None
    sc = spark.sparkContext
    sc.setJobGroup("r4_point_lookup", "probe")
    try:
        pid = svc._page_id(ds, "src/pkg1/mod3.py")
        missing = svc._page_id(ds, "nope.py")
    finally:
        sc.setJobGroup("r4_point_lookup_done", "done")
    assert pid is not None and missing is None
    assert sc.statusTracker().getJobIdsForGroup("r4_point_lookup") == []
    svc.refresh()


def test_point_lookup_case_fold_matches_spark_fkey(spark, catalog):
    """The driver-side fold twin must agree with the Spark fkey column —
    case/accent-mangled queries resolve identically to round 3."""
    cat, commit = catalog
    svc = LinkGraphService(cat)
    out = svc.shortest_paths("repoA", commit, "SRC/Pkg1/MOD3.PY", "src/pkg0/mod0.py")
    assert out["length"] == 1 and out["count"] == 1
    assert out["paths"] == [["src/pkg1/mod3.py", "src/pkg0/mod0.py"]]
    svc.refresh()


def test_large_dataset_falls_back_to_pinned_frame_probe(spark, catalog):
    cat, commit = catalog
    svc = LinkGraphService(cat, driver_index_max_rows=0)  # force the big path
    ds = svc._open("repoA", commit)
    assert ds.by_fkey is None and ds.by_id is None
    assert svc._page_id(ds, "src/pkg1/mod3.py") is not None
    assert svc._page_id(ds, "nope.py") is None
    out = svc.shortest_paths("repoA", commit, "src/pkg1/mod3.py", "src/pkg0/mod0.py")
    assert out["length"] == 1
    svc.refresh()


def test_pinned_lru_evicts_and_unpersists(spark, catalog):
    """ADVICE: _pinned must not grow without bound — the oldest dataset is
    evicted AND its frames unpersisted when the cap is hit (the reference
    keeps only the live datasets open, serve.rs:68-100)."""
    cat, commit = catalog
    svc = LinkGraphService(cat, max_pinned=2)
    a = svc._open("repoA", commit)
    b = svc._open("repoB", commit)
    # touching A makes B the LRU entry
    svc._open("repoA", commit)
    svc._open("repoC", commit)
    assert set(svc._pinned) == {("repoA", commit), ("repoC", commit)}
    # evicted B's frames are actually unpersisted (not merely dropped from
    # the dict — the whole point of the ADVICE item is executor storage)
    assert not b.lookup.storageLevel.useMemory
    assert not b.tables.edges.storageLevel.useMemory
    assert not b.tables.redirects.storageLevel.useMemory
    # surviving A's remain pinned
    assert a.lookup.storageLevel.useMemory
    svc.refresh()
    assert not svc._pinned
    assert not a.lookup.storageLevel.useMemory


# --- checkpoint/resume for the round-3 iterative ops (VERDICT item 2) ------


def test_multi_source_bfs_resume_identical(spark, edges_df, tmp_path):
    """Kill-at-level-k equivalent: an interrupted run (max_depth=4) leaves a
    committed checkpoint; the resumed run must equal the uninterrupted one."""
    from wikipath_spark.operators.bfs import multi_source_bfs
    from wikipath_spark.plans.checkpoint import CheckpointManager

    el = [(i, i + 1) for i in range(12)] + [(3, 20), (20, 21), (21, 22), (5, 0)]
    df = edges_df(el)
    srcs = [0, 5]
    want = sorted(map(tuple, multi_source_bfs(df, srcs).collect()))

    mgr = CheckpointManager(str(tmp_path), "msbfs")
    multi_source_bfs(df, srcs, max_depth=4, checkpoint_mgr=mgr, checkpoint_interval=2)
    assert mgr.latest() == 4
    resumed = multi_source_bfs(
        df, srcs, checkpoint_mgr=mgr, checkpoint_interval=2, resume=True
    )
    assert sorted(map(tuple, resumed.collect())) == want


def test_k_core_resume_identical(spark, edges_df, tmp_path):
    from wikipath_spark.operators.kcore import k_core
    from wikipath_spark.plans.checkpoint import CheckpointManager

    # a path peels from both ends (one round per layer) into a triangle core
    el = [(i, i + 1) for i in range(10)] + [(10, 11), (11, 12), (12, 10)]
    df = edges_df(el)
    want = sorted(map(tuple, k_core(df, k=2).collect()))
    assert want  # the triangle survives

    mgr = CheckpointManager(str(tmp_path), "kcore")
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        k_core(df, k=2, max_iter=3, checkpoint_mgr=mgr, checkpoint_interval=2)
    assert mgr.latest() == 2
    resumed = k_core(df, k=2, checkpoint_mgr=mgr, checkpoint_interval=2, resume=True)
    assert sorted(map(tuple, resumed.collect())) == want


def test_coreness_resume_identical(spark, edges_df, tmp_path):
    from wikipath_spark.operators.kcore import coreness
    from wikipath_spark.plans.checkpoint import CheckpointManager

    el = [(i, i + 1) for i in range(10)] + [(10, 11), (11, 12), (12, 10)]
    df = edges_df(el)
    want = sorted(map(tuple, coreness(df).collect()))

    mgr = CheckpointManager(str(tmp_path), "coreness")
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        coreness(df, max_iter=3, checkpoint_mgr=mgr, checkpoint_interval=2)
    assert mgr.latest() == 2
    resumed = coreness(df, checkpoint_mgr=mgr, checkpoint_interval=2, resume=True)
    assert sorted(map(tuple, resumed.collect())) == want


# --- wall-clock budgets on the batched/analytics loops (VERDICT item 4) ----


def test_budget_s_on_iterative_loops(spark, edges_df):
    """Every iterative entry point honors budget_s (serve.rs:203-206 parity):
    a zero budget raises QueryBudgetExceeded at the first superstep boundary."""
    import pytest as _pytest

    from wikipath_spark.operators.bfs import (
        QueryBudgetExceeded,
        bfs_distances,
        multi_source_bfs,
    )
    from wikipath_spark.operators.components import connected_components
    from wikipath_spark.operators.kcore import coreness, k_core
    from wikipath_spark.operators.labelprop import label_propagation
    from wikipath_spark.operators.pagerank import pagerank

    df = edges_df([(1, 2), (2, 3), (3, 1), (3, 4)])
    for fn in (
        lambda: multi_source_bfs(df, [1, 2], budget_s=0.0),
        lambda: bfs_distances(df, 1, budget_s=0.0),
        lambda: k_core(df, k=2, budget_s=0.0),
        lambda: coreness(df, budget_s=0.0),
        lambda: pagerank(df, budget_s=0.0),
        lambda: connected_components(df, budget_s=0.0),
        lambda: label_propagation(df, budget_s=0.0),
    ):
        with _pytest.raises(QueryBudgetExceeded):
            fn()


def test_budget_timeout_does_not_leak_persisted_frames(spark, edges_df):
    """A pagerank budget abort mid-loop must unpersist the loop's frames
    (contrib edges, vertex flags, current ranks) — a long-lived serve session
    would otherwise accumulate executor storage per timed-out query."""
    import pytest as _pytest

    from wikipath_spark.operators.bfs import QueryBudgetExceeded
    from wikipath_spark.operators.pagerank import pagerank

    sc = spark.sparkContext

    def persisted_ids():
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())

    df = edges_df([(i, (i * 7) % 50) for i in range(200)])
    spark.catalog.clearCache()
    before = persisted_ids()
    with _pytest.raises(QueryBudgetExceeded):
        pagerank(df, budget_s=0.0)
    after = persisted_ids()
    assert after <= before, f"leaked persisted RDDs: {after - before}"


def test_checkpoint_save_is_two_jobs(spark, edges_df, tmp_path):
    """VERDICT item: a durable checkpoint costs exactly TWO jobs — the state
    write and ONE verified re-read pass (manifest + observed row count for
    _COMMITTED riding the same action); the old separate count() job is gone."""
    from wikipath_spark.plans.checkpoint import CheckpointManager

    df = edges_df([(i, i + 1) for i in range(50)]).localCheckpoint(eager=True)
    mgr = CheckpointManager(str(tmp_path), "jobs")
    mgr.save(1, df, 0.0)  # warm (committers/codecs init)
    sc = spark.sparkContext
    # AQE splits one action into a job per materialized shuffle stage — turn
    # it off so the job count is deterministic (same caveat as the BFS
    # job-count test in test_round3)
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("r4_ckpt_jobs", "probe")
    try:
        out = mgr.save(2, df, 0.0)
    finally:
        sc.setJobGroup("r4_ckpt_jobs_done", "done")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert out["rows"] == 50
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("r4_ckpt_jobs"))
    assert n_jobs == 2, f"checkpoint save ran {n_jobs} jobs, want 2"
    # and the fused save still round-trips through the verifying loader
    state, metric = mgr.load(spark, 2)
    assert state.count() == 50 and metric == 0.0


# --- wide-state (vector) personalized PageRank (VERDICT item 7) ------------


def test_pagerank_multi_matches_numpy_oracle_both_impls(spark, edges_df):
    import random

    from wikipath_spark.operators.pagerank import (
        pagerank_multi,
        pagerank_multi_numpy_oracle,
    )

    random.seed(11)
    el = sorted({(random.randrange(40), random.randrange(40)) for _ in range(200)})
    el = [(a, b) for a, b in el if a != b]
    df = edges_df(el)
    ids = sorted({v for ab in el for v in ab})
    seeds = [ids[0], ids[len(ids) // 2], ids[-1]]  # distinct by construction
    oracle = pagerank_multi_numpy_oracle(el, seeds, iters=12)
    results = {}
    for impl in ("csr", "sql"):
        got = {r.page_id: r.ranks for r in
               pagerank_multi(df, seeds, iters=12, impl=impl).collect()}
        assert set(got) == set(oracle)
        for v in got:
            for i in range(len(seeds)):
                assert got[v][i] == pytest.approx(oracle[v][i], abs=1e-9)
        # each personalized component is a probability distribution
        for i in range(len(seeds)):
            assert sum(got[v][i] for v in got) == pytest.approx(1.0, abs=1e-9)
        results[impl] = got
    # the two physical strategies agree to summation-order noise
    for v in results["csr"]:
        for i in range(len(seeds)):
            assert results["csr"][v][i] == pytest.approx(
                results["sql"][v][i], abs=1e-12
            )


def test_pagerank_multi_seed_hygiene(spark, edges_df):
    from wikipath_spark.operators.pagerank import pagerank_multi

    df = edges_df([(1, 2), (2, 3), (3, 1)])
    a = sorted(map(tuple, pagerank_multi(df, [1, 1, 2], iters=3).collect()))
    b = sorted(map(tuple, pagerank_multi(df, [1, 2], iters=3).collect()))
    assert a == b
    with pytest.raises(ValueError, match="not in the vertex set"):
        pagerank_multi(df, [1, 999], iters=2)
    with pytest.raises(ValueError, match="non-empty"):
        pagerank_multi(df, [], iters=2)


def test_pagerank_multi_single_seed_equals_scalar_personalized(spark, edges_df):
    """k=1 vector pass agrees with the integer fixed-point personalized twin
    in RANKING (the fixed-point twin truncates; compare top-order)."""
    from wikipath_spark.operators.pagerank import pagerank_fixedpoint, pagerank_multi

    el = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (2, 4)]
    df = edges_df(el)
    vec = {r.page_id: r.ranks[0] for r in
           pagerank_multi(df, [1], iters=30, impl="sql").collect()}
    fp = {r.page_id: r.rank_fp for r in
          pagerank_fixedpoint(df, sources=[1], iters=30).collect()}
    order_vec = sorted(vec, key=lambda v: (-vec[v], v))
    order_fp = sorted(fp, key=lambda v: (-fp[v], v))
    assert order_vec == order_fp


def test_pagerank_multi_fixedpoint_bitwise_equivalences(spark, edges_df):
    """Integer vector twin: csr == sql BITWISE (integer sums commute across
    any physical aggregation), and each component == the scalar personalized
    fixed-point run — the chain that lets a DuckDB oracle hash-verify the
    Arrow 2-D scatter-add kernel itself."""
    import random

    from wikipath_spark.operators.pagerank import (
        pagerank_fixedpoint,
        pagerank_multi_fixedpoint,
    )

    random.seed(5)
    el = sorted({(random.randrange(30), random.randrange(30)) for _ in range(150)})
    el = [(a, b) for a, b in el if a != b]
    df = edges_df(el)
    ids = sorted({v for ab in el for v in ab})
    seeds = [ids[0], ids[-1]]
    csr = {r.page_id: list(r.ranks) for r in
           pagerank_multi_fixedpoint(df, seeds, impl="csr").collect()}
    sql = {r.page_id: list(r.ranks) for r in
           pagerank_multi_fixedpoint(df, seeds, impl="sql").collect()}
    assert csr == sql
    for i, s in enumerate(seeds):
        single = {r.page_id: r.rank_fp for r in
                  pagerank_fixedpoint(df, sources=[s]).collect()}
        assert all(csr[v][i] == single[v] for v in csr)
    with pytest.raises(ValueError, match="not in the vertex set"):
        pagerank_multi_fixedpoint(df, [ids[0], 10**9])


def test_pagerank_setup_failure_does_not_leak(spark, edges_df, tmp_path):
    """A corrupt checkpoint makes resume raise DURING SETUP (after several
    frames are persisted); nothing may stay pinned (code-review finding)."""
    import json
    import os

    from wikipath_spark.operators.pagerank import pagerank
    from wikipath_spark.plans.checkpoint import CheckpointManager

    sc = spark.sparkContext
    df = edges_df([(i, (i * 3) % 20) for i in range(60)])
    mgr = CheckpointManager(str(tmp_path), "leak")
    pagerank(df, checkpoint_mgr=mgr, checkpoint_interval=2, max_iter=4, tol=0.0)
    latest = mgr.latest()
    marker = os.path.join(str(tmp_path), "leak", f"superstep={latest}", "_COMMITTED")
    meta = json.load(open(marker))
    meta["rows"] += 7
    json.dump(meta, open(marker, "w"))

    spark.catalog.clearCache()
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    with pytest.raises(ValueError, match="corrupt"):
        pagerank(df, checkpoint_mgr=mgr, resume=True)
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before, f"setup-phase leak: {after - before}"


def test_pagerank_multi_empty_and_vector_cleanup(spark, edges_df):
    """Empty vertex set returns an empty frame (no TypeError), and the loop
    releases superseded state frames (code-review findings)."""
    from wikipath_spark.operators.pagerank import (
        pagerank_multi,
        pagerank_multi_fixedpoint,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank_multi(empty, [1], iters=2).count() == 0
    assert pagerank_multi_fixedpoint(empty, [1], iters=2).count() == 0


def test_repetition_stats_handcrafted(spark):
    """Gopher repetition gate on constructed documents with known answers."""
    from wikipath_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 non-blank lines, 2 of them duplicates of each other;
            # 7 tokens => 6 2-grams; "the cat" and "cat the" each ×2
            (1, "the cat\nthe cat\n\n  \nthe dog\nend"),
            (2, ""),                        # nothing at all
            (3, "one"),                     # 1 line, 1 token, no 2-grams
            (4, "a a a a"),                 # "a a" ×3
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert (out[1].lines, out[1].dup_lines) == (4, 1)
    assert (out[1].ngrams2, out[1].top2_count) == (6, 2)
    assert (out[2].lines, out[2].dup_lines, out[2].ngrams2, out[2].top2_count) == (0, 0, 0, 0)
    assert (out[3].lines, out[3].ngrams2, out[3].top2_count) == (1, 0, 0)
    assert (out[4].ngrams2, out[4].top2_count) == (3, 3)


def test_pii_redaction_planted(spark):
    """Planted-PII unit test: counts and the scrubbed text itself."""
    from wikipath_spark.functions.text import pii_stats, redact_pii

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.com and 192.168.1.250 or 555-867-5309 ok"),
         (2, "clean text, no pii at all"),
         (3, "two mails a@b.io c@d.org one ip 8.8.8.8")],
        ["doc_id", "text"],
    )
    stats = pii_stats(F.col("text"))
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        stats["email"].alias("e"), stats["ipv4"].alias("i"), stats["phone"].alias("p"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()}
    assert (out[1].e, out[1].i, out[1].p) == (1, 1, 1)
    assert out[1].red == "mail <EMAIL> and <IPV4> or <PHONE> ok"
    assert (out[2].e, out[2].i, out[2].p) == (0, 0, 0)
    assert out[2].red == "clean text, no pii at all"
    assert (out[3].e, out[3].i, out[3].p) == (2, 1, 0)


def test_domain_filter_planted(spark):
    from wikipath_spark.functions.text import domain_filter

    df = spark.createDataFrame(
        [(1, "links https://bad.example.com/a and http://good.org/b"),
         (2, "no urls here"),
         (3, "https://good.org https://bad.example.com http://bad.example.com")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in domain_filter(df, ["bad.example.com"]).collect()}
    assert (out[1].domains_n, out[1].blocked_n, out[1].keep) == (2, 1, False)
    assert (out[2].domains_n, out[2].blocked_n, out[2].keep) == (0, 0, True)
    assert (out[3].domains_n, out[3].blocked_n, out[3].keep) == (3, 2, False)
