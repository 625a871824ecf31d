"""Connected components — alternating large-star / small-star.

New capability per the north rule (the reference computes no components; its
closest notion is BFS reachability, search.rs:23-142).  Algorithm: the
alternating algorithm of Kiveris et al., "Connected Components in MapReduce
and Beyond" (SOCC 2014) — converges in O(log²) rounds on any graph and to
O(log) in practice, each round two self-equi-joins + aggregations (explicit
shuffles per superstep).

Output is exactly deterministic: every vertex maps to the **minimum vertex id
of its component** (the required tie-break for exact cross-parallelism
reproducibility, SURVEY.md §4.4).

Scale notes: rounds touch only the current parent edge set (≤ one row per
vertex after round 1); hub skew in the neighbor aggregation is a plain
min-aggregate (algebraic, map-side combinable) so no salting is needed.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from wikipath_spark.operators._loop import (
    checkpoint_tracked,
    estimated_bytes,
    release_checkpoint,
)


def _min_neighbor(edges: DataFrame) -> DataFrame:
    """For each u: m(u) = min(N(u) ∪ {u}) over the symmetric edge set."""
    sym = edges.select("u", "v")
    nbr_min = sym.groupBy("u").agg(F.min("v").alias("mn"))
    return nbr_min.select("u", F.least("u", "mn").alias("m"))


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) with v>u → (v, m(u)): strictly-larger neighbors hook onto u's min."""
    m = _min_neighbor(edges)
    return (
        edges.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(u,v) with v≤u → (v, m(u)) ∪ (u, m(u)): smaller neighbors re-hook."""
    smaller = edges.filter(F.col("v") <= F.col("u"))
    m = _min_neighbor(smaller)
    hooked = (
        smaller.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return hooked


def _cc_driver_numpy(src_ids, dst_ids):
    """Driver-side exact CC over numpy id arrays: min-label propagation +
    pointer jumping, all vectorized.  ``np.unique`` sorts ids, so index
    order == id order and the minimum representative INDEX is exactly the
    minimum vertex id of the component — the same labeling the alternating
    algorithm produces.  Self-loop-only vertices are dropped by the caller,
    matching the distributed lane's ``u != v`` filter."""
    import numpy as np

    ids, inv = np.unique(np.concatenate([src_ids, dst_ids]), return_inverse=True)
    ui, vi = inv[: len(src_ids)], inv[len(src_ids):]
    label = np.arange(len(ids), dtype=np.int64)
    while True:
        before = label
        m = np.minimum(label[ui], label[vi])
        label = label.copy()
        np.minimum.at(label, ui, m)
        np.minimum.at(label, vi, m)
        while True:
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label, before):
            break
    return ids, ids[label]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 2,
    checkpoint_mgr=None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    budget_s: float | None = None,
    driver_threshold_bytes: int = 256 << 20,
) -> DataFrame:
    """Undirected connected components over a directed edge table.

    Returns ``(page_id, component)`` where component = min id in component.
    Isolated vertices absent from ``edges`` are absent here; union the vertex
    table with identity components if needed (plans/analytics does).

    Adaptive physical strategy (round 6 — the compress_redirects /
    serve-BFS pattern): when Catalyst's own size estimate says the edge
    table fits comfortably in driver memory, the fixpoint runs as ONE Arrow
    ``toPandas`` + vectorized numpy min-label pointer jumping — the
    alternating-star loop costs ~1s of fixed scheduling per round even on a
    42k-row edge set (measured, OPTIMIZATION_r06.md), and resume/checkpoint
    machinery is meaningless at that size.  Identical output labeling
    (min-id representative; lane-equivalence-tested on random graphs);
    estimates are only trusted downward — unknown-size plans report MaxValue
    and stay distributed, which also keeps every small in-memory test graph
    on the distributed lane."""
    from wikipath_spark.operators.bfs import wall_budget

    if (
        checkpoint_mgr is None
        and not resume
        and estimated_bytes(edges) <= driver_threshold_bytes
    ):
        import pandas as pd

        pdf = edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        ).toPandas()
        u, v = pdf["u"].to_numpy(), pdf["v"].to_numpy()
        keep = u != v
        su, sv = u[keep], v[keep]
        spark = edges.sparkSession
        if len(su) == 0:
            return spark.createDataFrame([], "page_id long, component long")
        ids, comp = _cc_driver_numpy(su, sv)
        return spark.createDataFrame(
            pd.DataFrame({"page_id": ids, "component": comp}),
            "page_id long, component long",
        )

    check_budget = wall_budget(budget_s, "connected_components")
    # symmetrize once; each round operates on the shrinking parent-edge set
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = checkpoint_tracked(e)
    # convergence check = (row count, order-insensitive hash sum) fingerprint
    # riding on the materializing pass — one action per round instead of the
    # two full sorts an exceptAll comparison costs
    start_round = 0
    if checkpoint_mgr is not None and resume:
        latest = checkpoint_mgr.latest()
        if latest is not None:
            loaded, _ = checkpoint_mgr.load(edges.sparkSession, latest)
            release_checkpoint(e)
            e = checkpoint_tracked(loaded.select("u", "v"))
            start_round = latest
    prev_sig: tuple[int, int] | None = None
    converged = False
    # NB: unlike PageRank's fixed-shape superstep, CC's edge set SHRINKS each
    # round — AQE's runtime coalescing is a measured win here (17s vs 48s at
    # sf0.1 with it disabled), so the loop runs under normal session confs.
    for i in range(start_round, max_iter):
        check_budget()
        ls = _large_star(e)
        # large-star output is asymmetric (child→parent); symmetrize for the
        # next neighborhood computation.  No distinct needed: every ls row
        # has v < u strictly (v = min(N(u) ∪ u) and self-loops are filtered),
        # so the swapped orientation can never collide with the original and
        # ls itself is already distinct — same for the small-star output
        # below.  Each removed distinct was a full shuffle per round.
        sym = ls.union(ls.select(F.col("v").alias("u"), F.col("u").alias("v")))
        ss = _small_star(sym)
        obs = Observation(f"cc_{i}")
        new_e = (
            ss.union(ss.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1 << 40))).alias("h"),
            )
        )
        new_e = checkpoint_tracked(new_e)
        # fingerprint equality is probabilistic (40-bit hash-sum + count);
        # collision odds are astronomically small and the cost of a stale
        # match is one extra idempotent round, not a wrong answer
        sig = (int(obs.get["n"] or 0), int(obs.get["h"] or 0))
        # drop the superseded round's checkpoint blocks now (the early rounds
        # hold FULL symmetrized edge sets; DataFrame.unpersist alone is a
        # no-op on localCheckpointed frames).  The FINAL e stays checkpointed:
        # the star-forest extraction below reads it lazily.
        release_checkpoint(e)
        e = new_e
        converged = sig == prev_sig
        if checkpoint_mgr is not None and ((i + 1) % checkpoint_interval == 0 or converged):
            checkpoint_mgr.save(i + 1, e, float(sig[0]))
        if converged:
            break
        prev_sig = sig
    if not converged and max_iter > start_round:
        # the alternating algorithm converges in O(log² n) rounds — exhausting
        # max_iter means the star forest is NOT a fixpoint and the extraction
        # below may split true components; never return that silently.
        # (guarded like label_propagation's: when the loop body never ran —
        # resume at start_round >= max_iter, or max_iter=0 — there is no
        # fixpoint *failure* to report)
        warnings.warn(
            f"connected_components: no fixpoint after {max_iter} rounds; "
            "components may be over-split (raise max_iter)",
            stacklevel=2,
        )
    # star forest: component(u) = min neighbor (parent); parents map to themselves
    parent = e.groupBy("u").agg(F.min("v").alias("p"))
    comp = parent.select(
        F.col("u").alias("page_id"), F.least("u", "p").alias("component")
    )
    # vertices that are component minima may only appear as parents (v side)
    roots = (
        e.select(F.col("v").alias("page_id"))
        .distinct()
        .join(comp.select("page_id"), "page_id", "left_anti")
        .withColumn("component", F.col("page_id"))
    )
    out = comp.union(roots)
    # the result reads the final (checkpointed) edge frame; carry its
    # checkpoint ids so a finished caller can release_checkpoint() the blocks
    out._wps_ckpt_rdd_ids = getattr(e, "_wps_ckpt_rdd_ids", None) or set()
    return out
