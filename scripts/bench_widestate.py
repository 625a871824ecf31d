#!/usr/bin/env python
"""Wide-state PageRank benchmark: where the CSR/Arrow kernel wins.

VERDICT r3 item 7: at ONE double of per-vertex state the Arrow crossing
loses ~34% to the JVM hash aggregate (BENCH/BASELINE.md) — this script
measures the crossover as state widens.  Workload: k personalized PageRank
walks over the bench-scale synthetic link graph, computed three ways with
identical semantics (allclose 1e-12, asserted):

  A. k separate scalar passes   — pagerank_multi([s], impl="sql") per seed
     (the round-3 status quo: k driver loops, k× supersteps)
  B. one vector pass, SQL impl  — posexplode → k×|E| rows → JVM aggregate
  C. one vector pass, CSR impl  — messages stay 1 row carrying array<double>;
     2-D np.add.at inside applyInPandas

Prints one JSON line; a summary table goes to BENCH/BASELINE.md.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_widestate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipath_spark.operators.pagerank import pagerank_multi  # noqa: E402
from wikipath_spark.plans.build import build_graph  # noqa: E402
from wikipath_spark.session import get_spark  # noqa: E402
from wikipath_spark.sources.synthetic import synthetic_repos  # noqa: E402

ITERS = int(os.environ.get("WPS_WIDE_ITERS", "10"))
KS = [int(x) for x in os.environ.get("WPS_WIDE_KS", "1,4,16").split(",")]
CLASSES = int(os.environ.get("WPS_BENCH_CLASSES", "3000"))
REPOS = int(os.environ.get("WPS_BENCH_REPOS", "8"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench-widestate", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    g = build_graph(spark, synthetic_repos(spark, classes_per_repo=CLASSES, repos=REPOS))
    edges = g.edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    verts = g.pages.select("page_id").localCheckpoint(eager=True)
    seed_pool = [r.page_id for r in verts.orderBy("page_id").limit(max(KS)).collect()]

    # warm the python workers + codecs so strategy A (first timed run) isn't
    # charged the one-time spin-up the other strategies then get for free
    pagerank_multi(edges, seed_pool[:1], vertices=verts, iters=1, impl="csr").count()
    pagerank_multi(edges, seed_pool[:1], vertices=verts, iters=1, impl="sql").count()

    out = {"edges": n_edges, "iters": ITERS, "cores": cpus, "runs": {}}
    for k in KS:
        seeds = seed_pool[:k]
        row = {}

        t0 = time.time()
        csr = pagerank_multi(edges, seeds, vertices=verts, iters=ITERS, impl="csr")
        csr_rows = {r.page_id: r.ranks for r in csr.collect()}
        row["csr_vector_pass"] = round(time.time() - t0, 2)

        t0 = time.time()
        sql = pagerank_multi(edges, seeds, vertices=verts, iters=ITERS, impl="sql")
        sql_rows = {r.page_id: r.ranks for r in sql.collect()}
        row["sql_vector_pass"] = round(time.time() - t0, 2)

        t0 = time.time()
        sep = {}
        for s in seeds:
            one = pagerank_multi(edges, [s], vertices=verts, iters=ITERS, impl="sql")
            for r in one.collect():
                sep.setdefault(r.page_id, []).append(r.ranks[0])
        row["k_separate_sql_passes"] = round(time.time() - t0, 2)

        # equality across all three strategies (1e-12; different sum orders)
        err = max(
            max(
                abs(csr_rows[v][i] - sql_rows[v][i])
                for i in range(k)
            )
            for v in csr_rows
        )
        err_sep = max(
            max(abs(sep[v][i] - csr_rows[v][i]) for i in range(k)) for v in sep
        )
        assert err < 1e-12 and err_sep < 1e-12, (k, err, err_sep)
        row["max_impl_divergence"] = float(f"{max(err, err_sep):.3g}")
        row["csr_vs_sql_vector"] = round(row["sql_vector_pass"] / row["csr_vector_pass"], 2)
        row["csr_vs_separate"] = round(row["k_separate_sql_passes"] / row["csr_vector_pass"], 2)
        out["runs"][f"k={k}"] = row
        print(f"  k={k}: {row}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
