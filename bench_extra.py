#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for driver measurement —
this file carries the extra instrumentation the optimization guide asks for):

- per-query wall times with min-of-k repeats, timed via the SAME ``.count()``
  action the frozen bench uses (so numbers are comparable) and optionally via
  the noop sink (guide §1.4: computes every column, isolating computation),
- ``.explain("formatted")`` capture for every declared query →
  ``plans/r06/<query>_{before,after}.txt``,
- job labels (guide §1.5) so a Spark UI / event-log review maps time to
  queries.

Usage:
    python bench_extra.py time  [query ...]     # min-of-3 count() wall times
    python bench_extra.py noop  [query ...]     # noop-sink wall times
    python bench_extra.py plans [suffix] [query ...]   # dump explain() files
    python bench_extra.py kernel                # graph_build + pagerank timing
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entrymod
from wikipath_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("WPS_EXTRA_REPEATS", "3"))

BENCH_QUERIES = [
    "pricing_summary", "customer_nation_region", "top_orders_per_customer",
    "order_partkeys", "cc_copurchase", "bfs_distances", "triangles_copurchase",
    "text_stats", "exact_dedup", "minhash_signatures", "minhash_lsh_dedup",
    "ngram_jaccard", "curated_corpus", "simhash", "simhash_pairs",
    "cosine_topk", "cosine_topk_lsh", "embedding_near_dup", "events_windowed",
    "events_sessions", "media_features", "repetition_stats", "pii_scrub",
    "domain_filter",
]


def _spark():
    spark = get_spark(
        app_name="wikipath_spark-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_queries(names: list[str], action: str = "count") -> dict[str, float]:
    spark = _spark()
    queries = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} [{action}]")
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))
    return out


def dump_plans(names: list[str], suffix: str = "before") -> None:
    spark = _spark()
    queries = entrymod.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r06/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)


def kernel() -> None:
    """graph_build + pagerank at the frozen bench's synthetic scale."""
    from wikipath_spark.operators.pagerank import pagerank
    from wikipath_spark.plans.build import build_graph
    from wikipath_spark.sources.synthetic import synthetic_repos

    spark = _spark()
    classes = int(os.environ.get("WPS_BENCH_CLASSES", "3000"))
    repos = int(os.environ.get("WPS_BENCH_REPOS", "8"))
    t0 = time.time()
    g = build_graph(spark, synthetic_repos(spark, classes_per_repo=classes, repos=repos))
    g.edges = g.edges.persist()
    n_edges = g.edges.count()
    t_build = time.time() - t0
    t0 = time.time()
    res = pagerank(g.edges, vertices=g.pages.select("page_id"), tol=1e-6, max_iter=60)
    t_pr = time.time() - t0
    print(json.dumps({
        "graph_build": round(t_build, 3),
        "pagerank": round(t_pr, 3),
        "edges": n_edges,
        "iterations": res.iterations,
        "ss_per_min": round(res.iterations / t_pr * 60, 1),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if mode == "time":
        time_queries(rest or BENCH_QUERIES, action="count")
    elif mode == "noop":
        time_queries(rest or BENCH_QUERIES, action="noop")
    elif mode == "plans":
        suffix = rest[0] if rest else "before"
        dump_plans(rest[1:] or BENCH_QUERIES, suffix=suffix)
    elif mode == "kernel":
        kernel()
    else:
        raise SystemExit(f"unknown mode {mode}")
