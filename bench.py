#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE COMPACT
JSON line (guaranteed < 1900 bytes — the driver captures a bounded stdout
tail, which truncated round 4's full record)::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "run_id": ..., "query_rates_arr": [...], "flags": [...], ...}

The COMPLETE record (calibration samples, per-query normalized/raw deltas,
healthy-anchor ratios) is written to ``BENCH/bench_full_latest.json`` (or
``$WPS_BENCH_RECORD``), keyed to the stdout line by ``run_id``.

The headline metric is the PageRank kernel (the BASELINE.json target:
supersteps/min and edges-processed/sec to 1e-6 convergence) on the synthetic
link graph; per-query wall times cover the relational, graph, and
training-data operator families.  ``value`` is the total wall time of the
benchmark queries.

Scaling evidence (N vs 4N cores) lives in bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from wikipath_spark.operators.pagerank import pagerank
from wikipath_spark.plans.build import build_graph
from wikipath_spark.session import get_spark
from wikipath_spark.sources.synthetic import synthetic_repos

BENCH_QUERIES = [
    "pricing_summary",
    "customer_nation_region",
    "top_orders_per_customer",
    "order_partkeys",
    "cc_copurchase",
    "bfs_distances",
    "triangles_copurchase",
    "text_stats",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_dedup",
    "ngram_jaccard",
    "curated_corpus",
    "simhash",
    "simhash_pairs",
    "cosine_topk",
    "cosine_topk_lsh",
    "embedding_near_dup",
    "events_windowed",
    "events_sessions",
    "media_features",
    "repetition_stats",
    "pii_scrub",
    "domain_filter",
]

# synthetic graph scale for the PageRank kernel benchmark
GRAPH_CLASSES = int(os.environ.get("WPS_BENCH_CLASSES", "3000"))
GRAPH_REPOS = int(os.environ.get("WPS_BENCH_REPOS", "8"))


def _host_calibration() -> dict:
    """Host-speed reference measured at bench start: the sandbox VM's
    throughput swings >2x between runs (hypervisor noisy-neighbor phases —
    identical code measured 104s and 211s within one hour), so every bench
    line carries a CPU calibration to compare rounds honestly:
    single-process and 16-process sha256 chain rates (hashes/sec)."""
    import hashlib
    import multiprocessing as mp
    import time as _t

    def burn(n: int) -> int:
        h = b"x" * 64
        for _ in range(n):
            h = hashlib.sha256(h).digest()
        return 1

    n = 300_000
    t0 = _t.time(); burn(n); one = n / (_t.time() - t0)
    t0 = _t.time()
    with mp.Pool(16) as p:
        p.map(_burn_child, [n] * 16)
    many = 16 * n / (_t.time() - t0)
    return {"sha256_per_sec_1p": round(one), "sha256_per_sec_16p": round(many)}


def _burn_child(n: int) -> int:
    import hashlib

    h = b"x" * 64
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


class _CalibSampler:
    """Interleaved host-speed sampling: one persistent 16-process pool (spawn
    cost paid once), each ``sample()`` burns 16×60k sha256 chains (~0.1s on a
    healthy host) and records (elapsed-offset, rate).  The round-3 record was
    captured across a mid-run hypervisor degradation (16p 17.3M → 6.9M) and
    its run-MEAN normalization flagged two false regressions on late-suite
    queries; nearest-in-time samples attribute the noise to the queries that
    actually ran through it."""

    def __init__(self, procs: int = 16, chain: int = 60_000):
        import multiprocessing as mp

        self.procs, self.chain = procs, chain
        self.pool = mp.Pool(procs)
        self.t0 = time.time()
        self.samples: list[dict] = []

    def sample(self) -> float:
        t = time.time()
        self.pool.map(_burn_child, [self.chain] * self.procs)
        rate = self.procs * self.chain / (time.time() - t)
        self.samples.append({"t": round(t - self.t0, 1), "rate": round(rate)})
        return rate

    def rate_around(self, i: int) -> float:
        """Mean of the samples bracketing query i (sample i ran just before
        it, sample i+1 just after)."""
        lo = self.samples[min(i, len(self.samples) - 1)]["rate"]
        hi = self.samples[min(i + 1, len(self.samples) - 1)]["rate"]
        return (lo + hi) / 2

    def close(self) -> None:
        self.pool.terminate()
        self.pool.join()


def _deltas_vs_prev(timings: dict, query_rates: dict, sf_dir: str | None = None) -> dict:
    """Per-query wall-time ratio vs the newest PARSEABLE BENCH_r*.json
    (records whose ``parsed`` is null — e.g. a truncated stdout capture —
    are skipped, falling back to the next older round; ``vs_round`` records
    which one was used), normalized by the NEAREST-IN-TIME sha256
    calibration samples on both sides:
    ratio = (t_now · rate_now(q) / rate_prev(q)) / t_prev.  Prev-side rates
    come from the record's ``query_rates`` dict, its compact
    ``query_rates_arr`` (zipped against the insertion-ordered queries), or
    the start/end calibration mean.

    Returns ``{"normalized", "raw", "flags", "normalized_only",
    "vs_round"}``; a query is FLAGGED only when BOTH its raw wall-clock
    ratio and its normalized ratio exceed 1.3.  Rationale (measured round 4,
    three consecutive runs): the sha256 rate tracks Spark throughput only
    SUBLINEARLY on this VM — a 24M-calib window ran queries at the same
    speed as a 12-17M one — so normalizing alone over-corrects when the
    host looks faster (false flags on every query), while raw alone
    mislabels slow-host runs.  A true code regression shows up in both.
    ``normalized_only`` is the complementary ADVISORY list (normalized >
    1.3, raw ≤ 1.3): when the host genuinely got faster between runs, a
    real regression can hide behind a flat raw ratio — those stay visible
    here instead of being silently unflagged."""
    import glob
    import re

    benches = []
    for path in glob.glob(os.path.join(os.path.dirname(__file__) or ".", "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            benches.append((int(m.group(1)), path))
    prev, vs_round = {}, None
    for rnd, path in sorted(benches, reverse=True):
        try:
            with open(path) as f:
                cand = json.load(f).get("parsed") or {}
        except Exception:
            continue
        # only compare like-for-like scale factors: a local sf0.01 shakedown
        # vs the recorded sf0.1 round would mislabel every query
        if cand.get("queries") and (sf_dir is None or cand.get("sf") in (None, sf_dir)):
            prev, vs_round = cand, rnd
            break
    if not prev:
        return {}
    try:
        prev_q = prev.get("queries") or {}
        prev_rates = prev.get("query_rates") or {}
        if not prev_rates and prev.get("query_rates_arr"):
            prev_rates = dict(zip(prev_q.keys(), prev["query_rates_arr"]))
        if not prev_rates and prev.get("run_id"):
            # compact stdout capture: the full record on disk has the rates
            try:
                with open(os.path.join(os.path.dirname(__file__) or ".",
                                       "BENCH", "bench_full_latest.json")) as f:
                    rec = json.load(f)
                if rec.get("run_id") == prev.get("run_id"):
                    prev_rates = rec.get("query_rates") or {}
            except Exception:
                pass

        def mean_rate(c: dict):
            vals = [c.get("sha256_per_sec_16p"), c.get("sha256_per_sec_16p_end"),
                    c.get("p16_start"), c.get("p16_end")]
            vals = [v for v in vals if v]
            return sum(vals) / len(vals) if vals else None

        prev_mean = mean_rate(prev.get("host_calibration") or prev.get("calib") or {})
        norm, raw = {}, {}
        for q, t in timings.items():
            if not prev_q.get(q):
                continue
            r_prev = prev_rates.get(q) or prev_mean
            r_now = query_rates.get(q)
            scale = (r_now / r_prev) if (r_prev and r_now) else 1.0
            raw[q] = round(t / prev_q[q], 3)
            norm[q] = round(t * scale / prev_q[q], 3)
        flags = sorted(q for q in norm if norm[q] > 1.3 and raw[q] > 1.3)
        advisory = sorted(q for q in norm if norm[q] > 1.3 and raw[q] <= 1.3)
        return {
            "normalized": norm,
            "raw": raw,
            "flags": flags,
            "normalized_only": advisory,
            "vs_round": vs_round,
        }
    except Exception:
        return {}


def _deltas_vs_healthy(timings: dict) -> dict:
    """RAW wall-time ratios vs the newest BENCH/healthy_r*.json (per-query
    min over consecutive runs in a verified window) — a stable anchor that a
    single noisy-host capture cannot shift, complementing the vs-previous
    comparison.  Ratios here include whatever slowdown the CURRENT host
    phase adds, so read them alongside host_calibration.samples."""
    import glob
    import re

    recs = []
    base = os.path.join(os.path.dirname(__file__) or ".", "BENCH", "healthy_r*.json")
    for path in glob.glob(base):
        m = re.search(r"healthy_r(\d+)\.json$", path)
        if m:
            recs.append((int(m.group(1)), path))
    if not recs:
        return {}
    _, latest = max(recs)
    try:
        with open(latest) as f:
            ref = json.load(f).get("queries") or {}
        return {
            q: round(t / ref[q], 3) for q, t in timings.items() if ref.get(q)
        }
    except Exception:
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    calib = _host_calibration()  # re-sampled after the suite: the VM's noise
    # phases shift on minute scale, so a start-only sample can mislabel a run
    spark = get_spark(app_name="wikipath_spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    query_rates: dict[str, float] = {}
    queries = entrymod.queries()
    sampler = _CalibSampler()
    order: list[str] = []

    # WPS_BENCH_REPEATS=k records min-of-k per operator query (steady-state;
    # the headline kernel queries always run once).  Default 1: the driver's
    # per-round record stays single-shot/comparable; healthy-record captures
    # set k=3 (see BENCH/BASELINE.md round-4: per-query troughs hit DISJOINT
    # victims run to run, so the min is the steady-state number).
    repeats = max(1, int(os.environ.get("WPS_BENCH_REPEATS", "1")))

    def timed(name: str, fn, reps: int = 1) -> object:
        order.append(name)
        sampler.sample()  # nearest-BEFORE sample for this query
        best, out = None, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # ---- headline kernel: build + PageRank on the synthetic link graph
    def _build():
        repos = synthetic_repos(spark, classes_per_repo=GRAPH_CLASSES, repos=GRAPH_REPOS)
        g = build_graph(spark, repos)
        g.edges = g.edges.persist()
        return g, g.edges.count()

    g, n_edges = timed("graph_build", _build)
    res = timed(
        "pagerank_to_1e-6",
        lambda: pagerank(g.edges, vertices=g.pages.select("page_id"), tol=1e-6, max_iter=60),
    )
    pr_time = timings["pagerank_to_1e-6"]
    supersteps_per_min = res.iterations / pr_time * 60
    edges_per_sec = n_edges * res.iterations / pr_time

    # ---- operator queries at sf_dir
    for name in BENCH_QUERIES:
        timed(name, lambda name=name: queries[name](spark, sf_dir).count(), reps=repeats)

    sampler.sample()  # trailing sample: nearest-AFTER for the last query
    for i, name in enumerate(order):
        query_rates[name] = round(sampler.rate_around(i), 1)
    calib = {
        **calib,
        "sha256_per_sec_16p_end": sampler.samples[-1]["rate"],
        "samples": sampler.samples,
    }
    sampler.close()
    total = round(sum(timings.values()), 3)
    run_id = int(time.time())
    deltas = _deltas_vs_prev(timings, query_rates, sf_dir)
    full = {
        "metric": "pagerank supersteps/min + edges-processed/sec to 1e-6 (synthetic link graph) + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "run_id": run_id,
        "pagerank": {
            "edges": n_edges,
            "iterations": res.iterations,
            "converged": res.converged,
            "delta": res.delta,
            "supersteps_per_min": round(supersteps_per_min, 2),
            "edges_per_sec": round(edges_per_sec, 1),
        },
        "cores": cpus,
        "repeats": repeats,
        "host_calibration": calib,
        "query_rates": query_rates,
        "deltas_vs_prev": deltas,
        "deltas_vs_healthy": _deltas_vs_healthy(timings),
    }
    # the driver captures only a bounded stdout TAIL (round 4's full record
    # outgrew it → BENCH_r04.json parsed:null), so: the COMPLETE record goes
    # to disk, and stdout gets one compact line — totals, per-query times,
    # rates as a parallel int array, flags — guaranteed to fit the capture
    bench_dir = os.path.join(os.path.dirname(__file__) or ".", "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    record_path = os.environ.get("WPS_BENCH_RECORD") or os.path.join(
        bench_dir, "bench_full_latest.json"
    )
    with open(record_path, "w") as f:
        json.dump(full, f, indent=1)
    compact = {
        "metric": "pagerank ss/min + edges/s to 1e-6 + operator suite wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "run_id": run_id,
        "query_rates_arr": [int(round(query_rates[q])) for q in timings],
        "pagerank": full["pagerank"],
        "calib": {
            "p16_start": calib.get("sha256_per_sec_16p"),
            "p16_end": calib.get("sha256_per_sec_16p_end"),
        },
        "cores": cpus,
        "repeats": repeats,
        "flags": deltas.get("flags", []),
        "normalized_only": deltas.get("normalized_only", []),
        "vs_round": deltas.get("vs_round"),
        "full_record": record_path,
    }
    line = json.dumps(compact, separators=(",", ":"))
    for drop in ("pagerank", "query_rates_arr"):  # belt-and-braces: never
        if len(line) <= 1900:                     # outgrow the driver's tail
            break
        compact.pop(drop, None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    sys.exit(main())
