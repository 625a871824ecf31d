#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real multi-executor cluster exists in this sandbox, so the N-vs-4N
criterion is evidenced by running the identical PageRank job on the identical
deterministic synthetic edge table at two parallelism levels:

    N  = local[8]   (8 cores,  shuffle partitions 8)
    4N = local[32]  (32 cores, shuffle partitions 32)

Reported per level: wall time, supersteps/min, edges-processed/sec
(edges × supersteps ÷ wall), iterations (must be identical — determinism),
and  scaling_efficiency = (throughput_4N / throughput_N) / 4.

Each level runs in a fresh JVM (spawned subprocess) so executor-thread count
is really what changes.  Results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORKER = """
import json, sys, time
from wikipath_spark.session import get_spark
from wikipath_spark.sources.synthetic import synthetic_repos
from wikipath_spark.plans.build import build_graph
from wikipath_spark.operators.pagerank import pagerank

cores = int(sys.argv[1])
classes = int(sys.argv[2])
repos = int(sys.argv[3])
spark = get_spark(app_name=f"wps-scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
g = build_graph(spark, synthetic_repos(spark, classes_per_repo=classes, repos=repos))
g.edges = g.edges.persist()
n_edges = g.edges.count()
t0 = time.time()
res = pagerank(g.edges, vertices=g.pages.select("page_id"), tol=1e-6, max_iter=60)
res.ranks.count()
wall = time.time() - t0
top = sorted((r.page_id, round(r.rank, 10)) for r in res.ranks.orderBy("page_id").limit(5).collect())
print("RESULT " + json.dumps({
    "cores": cores, "edges": n_edges, "iterations": res.iterations,
    "wall_sec": round(wall, 2),
    "supersteps_per_min": round(res.iterations / wall * 60, 2),
    "edges_per_sec": round(n_edges * res.iterations / wall, 1),
    "sample_ranks": top,
}))
"""


def run_level(cores: int, classes: int, repos: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(classes), str(repos)],
        capture_output=True, text=True, timeout=3600, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    classes = int(os.environ.get("WPS_SCALE_CLASSES", "6000"))
    repos = int(os.environ.get("WPS_SCALE_REPOS", "16"))
    n = run_level(8, classes, repos)
    n4 = run_level(32, classes, repos)
    assert n["iterations"] == n4["iterations"], "determinism violation across parallelism"
    assert n["sample_ranks"] == n4["sample_ranks"], "rank mismatch across parallelism"
    eff = (n4["edges_per_sec"] / n["edges_per_sec"]) / 4
    summary = {
        "input_edges": n["edges"],
        "iterations": n["iterations"],
        "local8": n,
        "local32": n4,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(summary, indent=2))
    ts = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run {ts}\n\n"
            f"Synthetic link graph: {n['edges']} edges, PageRank to 1e-6, "
            f"{n['iterations']} supersteps (identical at both levels — determinism ✓).\n\n"
            "| level | cores | wall (s) | supersteps/min | edges/sec |\n"
            "|---|---|---|---|---|\n"
            f"| N | 8 | {n['wall_sec']} | {n['supersteps_per_min']} | {n['edges_per_sec']} |\n"
            f"| 4N | 32 | {n4['wall_sec']} | {n4['supersteps_per_min']} | {n4['edges_per_sec']} |\n\n"
            f"scaling_efficiency = (edges/sec@32 ÷ edges/sec@8) / 4 = **{eff:.3f}** "
            f"(target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
