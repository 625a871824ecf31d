"""k-core decomposition — iterative peel to the maximal subgraph in which
every vertex keeps degree ≥ k.

New capability per the north rule (no reference counterpart; the reference's
only traversal is bidirectional BFS, search.rs:23-217).  Standard peeling:
repeatedly delete vertices of (undirected, distinct-neighbor) degree < k;
the fixpoint is the k-core, independent of deletion order — which is what
makes the level-synchronous DataFrame formulation exact.

Each round is one degree aggregation + two semi-joins over the shrinking
edge set (explicit shuffles); the round's edge count rides on the
materializing pass via ``df.observe`` (one action per round), and an
unchanged count IS the fixpoint proof (peeling is monotone: no edge removed
⟺ no vertex was below k ⟺ stable).  SQL-expressible by unrolling rounds —
extra rounds past the fixpoint are idempotent, so a DuckDB twin with R ≥
convergence rounds matches exactly (__spark_entry__ ``graph_kcore``).

Scale notes: state is only the current edge set; degree counting is an
algebraic aggregate (map-side combinable, no salting needed — hub vertices
concentrate a count, not a data structure).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from wikipath_spark.operators._loop import checkpoint_tracked, release_checkpoint


def coreness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    checkpoint_mgr=None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    budget_s: float | None = None,
) -> DataFrame:
    """Full core decomposition: ``(page_id, coreness)`` for every vertex —
    the largest k such that the vertex belongs to the k-core.

    Algorithm: h-index iteration (Lü, Zhou, Zhang, Stanley, "The H-index of
    a network node and its relation to degree and coreness", 2016): start
    from c₀(v) = degree(v) and repeatedly set c(v) to the H-index of its
    neighbors' current values (the largest h with ≥ h neighbors valued ≥ h).
    The sequence decreases monotonically and its fixpoint IS the coreness —
    exact, and order-independent (the H-index is a multiset function), so
    the result is deterministic across engines and parallelism levels and
    has a DuckDB twin by unrolling rounds (``graph_coreness``).

    Each round: one join (neighbor estimates) + one window + one aggregate —
    the window and the aggregate share the hash(u) partitioning, so the
    round costs two shuffles.  The per-vertex H-index is
    max over the desc-sorted neighbor values e₁ ≥ e₂ ≥ … of min(rank, eᵣ),
    tie-order-free.  Convergence rides on the materializing pass as a
    (count, order-insensitive hash) fingerprint — one action per round.

    Resumable (north rule): the per-vertex estimate frame IS the loop state
    (``sym`` is a pure function of the input edges), so a durable checkpoint
    every ``checkpoint_interval`` rounds restarts mid-decomposition; the
    fingerprint is recomputed from the loaded state in one aggregate.
    ``budget_s`` bounds wall-clock seconds between rounds
    (:class:`~wikipath_spark.operators.bfs.QueryBudgetExceeded`).
    """
    from wikipath_spark.operators.bfs import wall_budget

    check_budget = wall_budget(budget_s, "coreness")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = checkpoint_tracked(sym)
    est = checkpoint_tracked(
        sym.groupBy("u")
        .agg(F.count("*").cast("long").alias("est"))
        .select(F.col("u").alias("page_id"), "est")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("u").orderBy(F.desc("est"))
    prev_sig: tuple[int, int] | None = None
    converged = False
    start_round = 0
    if checkpoint_mgr is not None and resume:
        latest = checkpoint_mgr.latest()
        if latest is not None:
            loaded, _ = checkpoint_mgr.load(edges.sparkSession, latest)
            release_checkpoint(est)
            est = checkpoint_tracked(loaded.select("page_id", "est"))
            sig_row = est.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.pmod(F.xxhash64("page_id", "est"), F.lit(1 << 40))).alias("h"),
            ).collect()[0]
            prev_sig = (int(sig_row["n"]), int(sig_row["h"] or 0))
            start_round = latest
    for i in range(start_round, max_iter):
        check_budget()
        nbr = sym.join(est, sym["v"] == est["page_id"]).select("u", "est")
        obs = Observation(f"coreness_{i}")
        new_est = (
            nbr.withColumn("_rn", F.row_number().over(w))
            .groupBy("u")
            .agg(F.max(F.least(F.col("_rn").cast("long"), F.col("est"))).alias("est"))
            .select(F.col("u").alias("page_id"), "est")
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.pmod(F.xxhash64("page_id", "est"), F.lit(1 << 40))).alias("h"),
            )
        )
        new_est = checkpoint_tracked(new_est)
        sig = (int(obs.get["n"] or 0), int(obs.get["h"] or 0))
        release_checkpoint(est)  # superseded round: drop blocks now
        est = new_est
        converged = sig == prev_sig
        if converged:
            break
        prev_sig = sig
        if checkpoint_mgr is not None and (i + 1) % checkpoint_interval == 0:
            checkpoint_mgr.save(i + 1, est, float(sig[0]))
    if not converged and max_iter > 0:
        warnings.warn(
            f"coreness: no fixpoint after {max_iter} rounds; estimates are an "
            "upper bound on the true coreness (raise max_iter)",
            stacklevel=2,
        )
    # the returned select reads only the (checkpointed) final est — the
    # symmetrized edge frame is done, so drop its blocks before returning
    release_checkpoint(sym)
    out = est.select("page_id", F.col("est").alias("coreness"))
    out._wps_ckpt_rdd_ids = getattr(est, "_wps_ckpt_rdd_ids", None) or set()
    return out


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    checkpoint_mgr=None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    budget_s: float | None = None,
) -> DataFrame:
    """Vertices of the k-core with their in-core degree: ``(page_id, degree)``.

    ``edges`` is directed input; the core is computed on the symmetrized
    self-loop-free graph (degree = number of distinct neighbors).

    Resumable (north rule): the surviving symmetric edge set IS the loop
    state (peeling only ever shrinks it), checkpointed with the edge count as
    the convergence metric; ``budget_s`` bounds wall-clock seconds between
    peel rounds.
    """
    from wikipath_spark.operators.bfs import wall_budget

    check_budget = wall_budget(budget_s, "k_core")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = checkpoint_tracked(e)
    prev_n = e.count()
    start_round = 0
    if checkpoint_mgr is not None and resume:
        latest = checkpoint_mgr.latest()
        if latest is not None:
            loaded, metric = checkpoint_mgr.load(edges.sparkSession, latest)
            release_checkpoint(e)
            e = checkpoint_tracked(loaded.select("u", "v"))
            prev_n = int(metric)
            start_round = latest
    converged = prev_n == 0
    for i in range(start_round, max_iter):
        if converged:
            break
        check_budget()
        deg = e.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u")
        obs = Observation(f"kcore_{i}")
        e2 = (
            e.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        e2 = checkpoint_tracked(e2)
        n2 = int(obs.get["n"] or 0)
        release_checkpoint(e)  # superseded peel round: drop blocks now
        e = e2
        converged = n2 == prev_n or n2 == 0
        prev_n = n2
        if checkpoint_mgr is not None and not converged and (i + 1) % checkpoint_interval == 0:
            checkpoint_mgr.save(i + 1, e, float(n2))
    if not converged and max_iter > 0:
        # peeling strictly shrinks until the fixpoint, so this means
        # max_iter rounds were not enough — the returned set OVER-approximates
        # the true k-core; never silent (same contract as components/LPA)
        warnings.warn(
            f"k_core: no fixpoint after {max_iter} rounds; "
            "result over-approximates the k-core (raise max_iter)",
            stacklevel=2,
        )
    out = (
        e.groupBy("u")
        .agg(F.count("*").alias("degree"))
        .select(F.col("u").alias("page_id"), "degree")
    )
    out._wps_ckpt_rdd_ids = getattr(e, "_wps_ckpt_rdd_ids", None) or set()
    return out
