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
from pyspark.sql import functions as F
from wikipath_spark.session import get_spark
from wikipath_spark.sources.synthetic import synthetic_edges
from wikipath_spark.operators.pagerank import pagerank

cores, n_vertices, n_edges_req, iters = (int(a) for a in sys.argv[1:5])
spark = get_spark(app_name=f"wps-scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
edges = synthetic_edges(spark, n_vertices, n_edges_req).persist()
n_edges = edges.count()
vertices = spark.range(0, n_vertices).select(F.col("id").alias("page_id"))
t0 = time.time()
res = pagerank(edges, vertices=vertices, tol=1e-9, max_iter=iters)
res.ranks.count()
wall = time.time() - t0
top = sorted((r.page_id, round(r.rank, 12)) for r in res.ranks.orderBy("page_id").limit(5).collect())
print("RESULT " + json.dumps({
    "cores": cores, "edges": n_edges, "iterations": res.iterations,
    "wall_sec": round(wall, 2),
    "supersteps_per_min": round(res.iterations / wall * 60, 2),
    "edges_per_sec": round(n_edges * res.iterations / wall, 1),
    "sample_ranks": top,
}))
"""


def run_level(cores: int, n_vertices: int, n_edges: int, iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_vertices), str(n_edges), str(iters)],
        capture_output=True, text=True, timeout=3600, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_vertices = int(os.environ.get("WPS_SCALE_VERTICES", "2000000"))
    n_edges = int(os.environ.get("WPS_SCALE_EDGES", "40000000"))
    iters = int(os.environ.get("WPS_SCALE_ITERS", "12"))
    n = run_level(8, n_vertices, n_edges, iters)
    n4 = run_level(32, n_vertices, n_edges, iters)
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
            f"Deterministic synthetic edge table: {n['edges']} edges over "
            f"{os.environ.get('WPS_SCALE_VERTICES', '2000000')} vertices (hub skew), "
            f"{n['iterations']} PageRank supersteps (identical at both levels; "
            f"sample ranks bit-identical — determinism ✓).\n\n"
            "| level | cores | wall (s) | supersteps/min | edges/sec |\n"
            "|---|---|---|---|---|\n"
            f"| N | 8 | {n['wall_sec']} | {n['supersteps_per_min']} | {n['edges_per_sec']} |\n"
            f"| 4N | 32 | {n4['wall_sec']} | {n4['supersteps_per_min']} | {n4['edges_per_sec']} |\n\n"
            f"scaling_efficiency = (edges/sec@32 ÷ edges/sec@8) / 4 = **{eff:.3f}** "
            f"(target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
