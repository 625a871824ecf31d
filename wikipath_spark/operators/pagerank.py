"""PageRank by power iteration — the engine's benchmark kernel.

No counterpart exists in the reference (its only traversal is bidirectional
BFS, search.rs:23-217); semantics are the standard definition required by the
north rule: damping 0.85, dangling-mass redistribution, convergence at
L∞ < 1e-6, scores validated against a numpy oracle (allclose 1e-6).

Each superstep is one explicit shuffle: ``ranks ⋈ edges on src`` then
``groupBy(dst).sum``.  Two message-aggregation physical strategies:

- ``impl="sql"``  — built-in hash aggregate (whole-stage codegen, partial
  map-side combine for free).
- ``impl="csr"``  — per-partition sparse gather-scatter: messages grouped by
  ``pmod(xxhash64(dst), P)`` and summed inside ``applyInPandas`` with
  ``np.add.at`` over factorized (CSR-style) dst indices — the Arrow-batched
  kernel path the north star mandates; useful headroom for fatter per-vertex
  state than a single double.

Skew: hub vertices (power-law in-degree, the Wikipedia-style distribution the
reference's adjacency lists embody, database.rs:225-243) concentrate one
groupBy key.  ``salt_partials=k`` turns the aggregation into salted two-stage
(partial sums over (dst, salt) then final over dst) via operators/skew.py.

Lineage: driver-side iteration grows the plan each superstep;
``localCheckpoint`` every ``checkpoint_every`` steps truncates it, and an
optional durable checkpoint (plans/checkpoint.py) makes runs resumable with
per-partition lineage + convergence metrics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from wikipath_spark.operators._loop import (
    checkpoint_tracked,
    loop_confs,
    release_checkpoint,
)
from wikipath_spark.operators.skew import pick_salt, salted_sum


@dataclass
class PageRankResult:
    ranks: DataFrame          # (page_id, rank)
    iterations: int
    delta: float              # final L∞ delta
    converged: bool


def _csr_partial_sum(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group sparse scatter-add: sum contribs by dst with numpy.

    Factorize dst into dense local indices (a per-partition CSR column
    index), then ``np.add.at`` — one vectorized pass, no Python per row.
    """
    dst_codes, dst_uniques = pd.factorize(pdf["dst"], sort=False)
    sums = np.zeros(len(dst_uniques), dtype=np.float64)
    np.add.at(sums, dst_codes, pdf["contrib"].to_numpy())
    return pd.DataFrame({"dst": dst_uniques, "partial": sums})


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    impl: str = "sql",
    salt_partials: int | None = None,
    checkpoint_every: int = 1,
    on_superstep=None,
    checkpoint_mgr=None,
    checkpoint_interval: int = 10,
    resume: bool = False,
    budget_s: float | None = None,
) -> PageRankResult:
    """Power-iteration PageRank over a directed ``(src, dst)`` edge table.

    ``vertices``: optional (page_id) frame; defaults to ids present in edges.
    ``on_superstep(i, ranks_df, delta)`` is the checkpoint hook.
    Returned ranks sum to 1 and include dangling vertices.
    """
    spark = edges.sparkSession

    n_edges = edges.count()
    # loop_confs: AQE off (fixed-shape superstep — re-planning is pure
    # per-iteration overhead), auto-broadcast off (driver-serialized broadcast
    # of the evolving ranks flattens core scaling — measured 8→32 gave only
    # 1.2x), shuffle parallelism sized to data (~500k edge rows/partition, so
    # tiny graphs don't fan out into near-empty tasks).  Context manager =
    # try/finally: an exception mid-loop must not leak these confs.
    with loop_confs(spark, rows=n_edges) as sc_parts:
        return _pagerank_loop(
            spark, edges, vertices, damping, tol, max_iter, impl, salt_partials,
            checkpoint_every, on_superstep, checkpoint_mgr, checkpoint_interval,
            resume, n_edges, sc_parts, budget_s,
        )


def _pagerank_loop(
    spark, edges, vertices, damping, tol, max_iter, impl, salt_partials,
    checkpoint_every, on_superstep, checkpoint_mgr, checkpoint_interval,
    resume, n_edges, sc_parts, budget_s=None,
) -> PageRankResult:
    from wikipath_spark.operators.bfs import wall_budget

    check_budget = wall_budget(budget_s, "pagerank")
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("page_id"))
            .union(edges.select(F.col("dst").alias("page_id")))
            .distinct()
        )
    vertices = vertices.select("page_id")

    # everything persisted below must be released on ANY exit — including a
    # failure during setup itself (e.g. a corrupt checkpoint raising from
    # load, or a budget timeout in-loop), not just the happy path: a
    # long-lived serve session would otherwise accumulate executor storage
    # per failed call
    contrib_edges = vflag = ranks = None
    try:
        if salt_partials is None:
            # auto (the default): salt so no hub's in-neighborhood exceeds one
            # task's budget (SURVEY.md §4.2 — from the degree distribution).
            # n_edges bounds every in-degree, so when the WHOLE edge table
            # fits one task's budget the probe job could only return 1 —
            # skip it (one fewer fixed-latency setup action; same salt, so
            # the float sum grouping — and every rank bit — is unchanged)
            salt_partials = (
                1 if n_edges <= 5_000_000
                else pick_salt(edges, key="dst", rows_per_task=5_000_000)
            )

        out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
        # contribution edges: weight = 1/out_deg, partitioned once by src and
        # reused every superstep (the join's build side never re-shuffles).
        # checkpoint_tracked, not persist: a cached frame EMBEDS its whole
        # build lineage in every superstep's logical plan, and Catalyst
        # re-analyzes that tree per iteration — with a LogicalRDD leaf the
        # per-superstep plan is a few nodes (measured in OPTIMIZATION_r06.md:
        # driver-side plan build 0.10s → 0.03s per superstep).  AQE is off
        # here (loop_confs), so the hash(src) partitioning and sort survive
        # the checkpoint and the superstep join still needs no exchange.
        contrib_edges = checkpoint_tracked(
            edges.join(out_deg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
            .repartition(sc_parts, "src")
        )

        # dangling flag lives on the vertex frame so the per-superstep action
        # can produce next iteration's dangling mass and the convergence delta
        # in ONE aggregation (one Spark job per superstep, not three).
        # src ids come from the checkpointed contribution table — already
        # hash(src)-partitioned, so the distinct needs no exchange (the old
        # edges.select(src).distinct() re-shuffled the raw edge table); the
        # initial dangling mass AND the vertex count both ride the
        # materializing checkpoint as observes (the old separate
        # vertices.persist()+count() action — and its cache — are gone).
        srcs = contrib_edges.select("src").distinct()
        vobs = Observation("pr_init")
        vflag = checkpoint_tracked(
            vertices.join(srcs, vertices["page_id"] == srcs["src"], "left")
            .select("page_id", F.col("src").isNull().alias("is_dangling"))
            .repartition(sc_parts, "page_id")
            .observe(
                vobs,
                F.sum(F.col("is_dangling").cast("long")).alias("nd"),
                F.count(F.lit(1)).alias("nv"),
            )
        )
        metrics = vobs.get
        n = int(metrics["nv"] or 0)
        if n == 0:
            # empty-graph exit: derive from `vertices`, NOT vflag — the
            # finally block releases vflag's checkpoint on this return
            return PageRankResult(
                vertices.withColumn("rank", F.lit(0.0)), 0, 0.0, True
            )
        ranks = vflag.select(
            "page_id", F.lit(1.0 / n).alias("rank"), "is_dangling"
        ).persist()
        dangling_mass = int(metrics["nd"] or 0) * (1.0 / n)
        start_it = 0
        if checkpoint_mgr is not None and resume:
            latest = checkpoint_mgr.latest()
            if latest is not None:
                loaded, _metric = checkpoint_mgr.load(spark, latest)
                ranks.unpersist()
                ranks = (
                    loaded.select("page_id", "rank")
                    .join(vflag, "page_id")
                    .select("page_id", "rank", "is_dangling")
                    .persist()
                )
                start_it = latest
        if start_it > 0:
            # resumed: recompute the dangling mass of the restored state (1 job)
            dangling_mass = (
                ranks.join(vflag.filter("is_dangling"), "page_id", "left_semi")
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
        base = (1.0 - damping) / n
        return _pagerank_iterate(
            spark, ranks, contrib_edges, vflag, dangling_mass, base, damping, n,
            tol, max_iter, start_it, impl, salt_partials, sc_parts,
            checkpoint_every, on_superstep, checkpoint_mgr, checkpoint_interval,
            check_budget,
        )
    except BaseException:
        # setup-phase abort: release the initial state frame (in-loop aborts
        # release the CURRENT frame inside _pagerank_iterate; unpersisting an
        # already-released frame is a no-op, so both paths are safe)
        if ranks is not None:
            ranks.unpersist()
        raise
    finally:
        if contrib_edges is not None:
            release_checkpoint(contrib_edges)
        if vflag is not None:
            release_checkpoint(vflag)


def _pagerank_iterate(
    spark, ranks, contrib_edges, vflag, dangling_mass, base, damping, n,
    tol, max_iter, start_it, impl, salt_partials, sc_parts,
    checkpoint_every, on_superstep, checkpoint_mgr, checkpoint_interval,
    check_budget,
) -> PageRankResult:
    delta = float("inf")
    it = start_it
    # checkpointed frames whose block release is DEFERRED: when the successor
    # state took the persist-only branch, its recompute path still runs
    # through the predecessor's checkpoint (a localCheckpointed RDD cannot be
    # recomputed), so those blocks may only drop once a NEWER self-contained
    # checkpoint exists.  Holds at most one frame at a time.
    deferred: list = []
    try:
        for it in range(start_it + 1, max_iter + 1):
            check_budget()
            joined = contrib_edges.join(ranks, contrib_edges["src"] == ranks["page_id"])
            # src rides along only when salting needs it (deterministic per-row
            # salt source) — otherwise keep the shuffled message row minimal
            msg_cols = (["src"] if salt_partials > 1 and impl != "csr" else []) + ["dst"]
            msgs = joined.select(*msg_cols, (F.col("rank") * F.col("w")).alias("contrib"))
            if impl == "csr":
                # applyInPandas over hash buckets: Arrow-batched numpy scatter-add
                sums = (
                    msgs.withColumn("_b", F.pmod(F.xxhash64("dst"), F.lit(sc_parts)))
                    .groupBy("_b")
                    .applyInPandas(
                        lambda pdf: _csr_partial_sum(pdf[["dst", "contrib"]]),
                        schema="dst long, partial double",
                    )
                    .groupBy("dst")
                    .agg(F.sum("partial").alias("msum"))
                )
            elif salt_partials > 1:
                # salt bucket from the message's src vertex: row-distinct within a
                # hub's in-neighborhood (unlike the contrib value, which is equal
                # across rows at uniform init) and deterministic across runs and
                # parallelism levels — required for bit-identical ranks
                sums = salted_sum(
                    msgs, key="dst", value="contrib", salt=salt_partials,
                    out="msum", salt_source="src",
                )
            else:
                sums = msgs.groupBy("dst").agg(F.sum("contrib").alias("msum"))

            const = base + damping * dangling_mass / n
            # state = (page_id, rank, is_dangling); convergence delta and next
            # dangling mass ride on df.observe over the SAME materializing pass —
            # no separate old-vs-new join (SURVEY.md §4.5: no UDF, join-free here
            # because the old rank is already a column of the state being updated)
            obs = Observation(f"pr_{it}")
            new_ranks = (
                ranks.join(sums, ranks["page_id"] == sums["dst"], "left")
                .select(
                    "page_id",
                    (F.lit(const) + F.lit(damping) * F.coalesce("msum", F.lit(0.0))).alias("rank"),
                    "is_dangling",
                    F.col("rank").alias("_old"),
                )
                .observe(
                    obs,
                    F.max(F.abs(F.col("rank") - F.col("_old"))).alias("d"),
                    F.sum(F.when(F.col("is_dangling"), F.col("rank")).otherwise(0.0)).alias("dm"),
                )
                .drop("_old")
            )
            ckpt_now = it % checkpoint_every == 0
            if ckpt_now:
                # eager truncation: measured 2x faster than letting the logical
                # plan grow even 5 iterations — Catalyst re-analyzes the whole
                # lineage each superstep otherwise (see BENCH/BASELINE.md).
                # Tracked so the superseded frame's checkpoint BLOCKS can be
                # dropped once safe (plain unpersist() is a no-op on a
                # localCheckpointed frame — blocks live in the BlockManager,
                # not the CacheManager)
                new_ranks = checkpoint_tracked(new_ranks)
            else:
                new_ranks = new_ranks.persist()
                new_ranks.count()
            metrics = obs.get
            delta, dangling_mass = metrics["d"], metrics["dm"] or 0.0
            if ckpt_now:
                # a fresh self-contained checkpoint supersedes everything
                # before it: release the predecessor AND any deferred frame
                release_checkpoint(ranks)
                for stale in deferred:
                    release_checkpoint(stale)
                deferred.clear()
            elif getattr(ranks, "_wps_ckpt_rdd_ids", None):
                deferred.append(ranks)  # persist-only successor still needs it
            else:
                ranks.unpersist()  # plain persist frame: recompute walks lineage
            ranks = new_ranks
            converged_now = delta < tol
            if checkpoint_mgr is not None and (it % checkpoint_interval == 0 or converged_now):
                checkpoint_mgr.save(it, ranks.select("page_id", "rank"), float(delta))
            if on_superstep is not None:
                on_superstep(it, ranks, delta)
            if converged_now:
                break

        # success: the final state (and, when the loop ended on a persist-only
        # iteration, the one deferred checkpoint backing it) stays alive for
        # the caller — the returned frame carries the checkpoint ids so a
        # caller that is DONE with the result can release_checkpoint() it
        out = ranks.select("page_id", "rank")
        out._wps_ckpt_rdd_ids = set(getattr(ranks, "_wps_ckpt_rdd_ids", None) or set())
        for kept in deferred:
            out._wps_ckpt_rdd_ids |= kept._wps_ckpt_rdd_ids
        return PageRankResult(out, it, float(delta), delta < tol)
    except BaseException:
        # mid-loop abort (budget timeout, checkpoint-hook bomb): release
        # the CURRENT state frame and any deferred predecessor — on success
        # they stay persisted for the caller (documented result contract)
        release_checkpoint(ranks)
        for stale in deferred:
            release_checkpoint(stale)
        raise


def pagerank_fixedpoint(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iters: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    sources: list[int] | None = None,
) -> DataFrame:
    """Bit-portable integer PageRank: rank mass as scaled int64, EXACT
    integer arithmetic, fixed iteration count.

    The float kernel (:func:`pagerank`) cannot be hash-compared across
    engines (summation order changes the last ulps); this twin replaces
    every float op with its integer analogue so any engine produces the
    exact same bits — integer sums commute, truncating division is
    deterministic:

    - r0(v)   = scale div n                    (over the jump set, else 0)
    - contrib = r(src) div out_deg(src)                 (per edge)
    - dm      = Σ r(v) over dangling v
    - r'(v)   = [v ∈ jump set] · ( ((den-num)·scale) div (den·n)
                                   + (num·(dm div n)) div den )
                + (num·msum(v)) div den

    ``sources`` switches to PERSONALIZED PageRank: the jump set becomes the
    source vertices (n = |sources|) instead of all vertices — teleport and
    dangling mass return to the sources only, so ranks measure proximity to
    that seed set (the standard relatedness query over a link graph).
    ``sources=None`` is classic PageRank (jump set = every vertex).

    Mirrored term-for-term by the DuckDB oracles in ``__spark_entry__``
    (``graph_pagerank_fixed`` / ``graph_pagerank_personalized``), closing
    the one rows-only row from round 2.  Returns ``(page_id, rank_fp)``.
    All values stay well inside int64: total mass ≤ scale, per-term
    products ≤ num·scale.
    """
    if sources is not None:
        # duplicates would inflate n while isin() dedups, leaking teleport +
        # dangling mass; ids absent from the vertex set would do the same.
        sources = [int(s) for s in dict.fromkeys(sources)]
        if not sources:
            raise ValueError("pagerank_fixedpoint: sources must be non-empty (or None)")
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("page_id"))
            .union(edges.select(F.col("dst").alias("page_id")))
            .distinct()
        )
    vertices = vertices.select("page_id")
    n_vertices = vertices.count()
    if n_vertices == 0:
        return vertices.withColumn("rank_fp", F.lit(0).cast("long"))
    # n = size of the jump set (all vertices, or the personalization seeds)
    n = n_vertices if sources is None else len(sources)

    out_deg = edges.groupBy("src").agg(F.count("*").alias("od"))
    edges_od = checkpoint_tracked(edges.select("src", "dst").join(out_deg, "src"))
    srcs = edges.select("src").distinct()
    in_jump = (
        F.lit(True) if sources is None else F.col("page_id").isin([int(s) for s in sources])
    )
    vflag = checkpoint_tracked(
        vertices.join(srcs, vertices["page_id"] == srcs["src"], "left")
        .select(
            "page_id",
            F.col("src").isNull().alias("is_dangling"),
            in_jump.alias("is_jump"),
        )
    )
    r0_val = scale // n
    flags = vflag.agg(
        F.count(F.when(F.col("is_jump"), 1)).alias("n_jump"),
        F.count(F.when(F.col("is_dangling") & F.col("is_jump"), 1)).alias("n_dj"),
    ).first()
    if sources is not None and flags["n_jump"] != n:
        raise ValueError(
            f"pagerank_fixedpoint: {n - flags['n_jump']} source id(s) not in the "
            "vertex set — personalization mass would leak"
        )
    dm = r0_val * flags["n_dj"]
    jump = ((damping_den - damping_num) * scale) // (damping_den * n)

    ranks = checkpoint_tracked(
        vflag.select(
            "page_id",
            F.when(F.col("is_jump"), F.lit(r0_val)).otherwise(F.lit(0)).cast("long").alias("rank_fp"),
            "is_dangling",
            "is_jump",
        )
    )
    try:
        for it in range(1, iters + 1):
            msgs = edges_od.join(ranks, edges_od["src"] == ranks["page_id"]).select(
                "dst", F.expr("rank_fp div od").alias("c")
            )
            msum = msgs.groupBy("dst").agg(F.sum("c").alias("msum"))
            dangling_term = (damping_num * (dm // n)) // damping_den
            obs = Observation(f"prf_{it}")
            new_ranks = checkpoint_tracked(
                ranks.join(msum, ranks["page_id"] == msum["dst"], "left")
                .select(
                    "page_id",
                    (
                        F.when(F.col("is_jump"), F.lit(jump + dangling_term)).otherwise(F.lit(0)).cast("long")
                        + F.expr(f"({damping_num} * coalesce(msum, 0L)) div {damping_den}")
                    ).alias("rank_fp"),
                    "is_dangling",
                    "is_jump",
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("is_dangling"), F.col("rank_fp")).otherwise(F.lit(0).cast("long"))
                    ).alias("dm"),
                )
            )
            dm = int(obs.get["dm"] or 0)
            release_checkpoint(ranks)  # superseded state: drop blocks NOW
            ranks = new_ranks
        # the FINAL state frame stays checkpointed — the returned select
        # reads it (a localCheckpointed RDD cannot be recomputed); its
        # checkpoint ids ride on the result so a caller that is DONE can
        # free the blocks with release_checkpoint()
        out = ranks.select("page_id", "rank_fp")
        out._wps_ckpt_rdd_ids = getattr(ranks, "_wps_ckpt_rdd_ids", None) or set()
        return out
    except BaseException:
        release_checkpoint(ranks)
        raise
    finally:
        release_checkpoint(edges_od)
        release_checkpoint(vflag)


def pagerank_numpy_oracle(edge_list, n=None, damping=0.85, tol=1e-6, max_iter=100):
    """Driver-side numpy oracle (tests only): identical semantics."""
    edges = np.asarray(edge_list, dtype=np.int64)
    ids = np.unique(edges) if n is None else np.arange(n)
    idx = {v: i for i, v in enumerate(ids)}
    src = np.array([idx[s] for s, _ in edges])
    dst = np.array([idx[d] for _, d in edges])
    nn = len(ids)
    out_deg = np.bincount(src, minlength=nn)
    r = np.full(nn, 1.0 / nn)
    for _ in range(max_iter):
        dangling_mass = r[out_deg == 0].sum()
        contrib = np.zeros(nn)
        np.add.at(contrib, dst, r[src] / out_deg[src])
        new = (1 - damping) / nn + damping * (contrib + dangling_mass / nn)
        if np.abs(new - r).max() < tol:
            r = new
            break
        r = new
    return dict(zip(ids.tolist(), r.tolist()))


# ---------------------------------------------------------------------------
# Wide-state (vector-rank) PageRank: k personalized walks in one loop
# ---------------------------------------------------------------------------


def _csr_partial_vecsum(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vector twin of :func:`_csr_partial_sum`: per-group scatter-add of
    (rows, k) contribution MATRICES by dst — one ``np.add.at`` over a 2-D
    array, so the per-row Arrow/pandas overhead is amortized over all k
    components at once (this is where the CSR kernel beats the JVM path:
    the SQL formulation must explode k rows per message)."""
    dst_codes, dst_uniques = pd.factorize(pdf["dst"], sort=False)
    mat = np.vstack(pdf["vec"].to_numpy())
    # dtype-generic: float64 for the float kernel, int64 for the fixed-point
    # twin (integer adds are exact, which is what makes that path hash-exact)
    sums = np.zeros((len(dst_uniques), mat.shape[1]), dtype=mat.dtype)
    np.add.at(sums, dst_codes, mat)
    return pd.DataFrame({"dst": dst_uniques, "vec": list(sums)})


def pagerank_multi(
    edges: DataFrame,
    seeds: list[int],
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    iters: int = 20,
    impl: str = "csr",
    budget_s: float | None = None,
) -> DataFrame:
    """k personalized PageRank walks computed simultaneously: the per-vertex
    state is a length-k rank VECTOR (component i = personalized PageRank
    seeded at ``seeds[i]``), updated by one shared superstep loop over one
    shared edge structure — the batched form of the relatedness query a
    serving layer answers per seed (and of ``graph_pagerank_personalized``).

    This is the wide-state workload the CSR kernel exists for (VERDICT r3
    item 7): at one double of state per vertex the Arrow crossing loses to
    the JVM hash aggregate (BENCH/BASELINE.md, −34%), but with k doubles the
    kernel moves k values per Arrow row while the pure-SQL twin must
    posexplode into k×|E| rows through the shuffle.

    impls (bit-for-bit different summation orders, equal within 1e-12):

    - ``"csr"``     — messages stay ONE row carrying an array<double>;
      aggregation is a 2-D ``np.add.at`` inside ``applyInPandas`` over
      dst-hash buckets (each dst in exactly one bucket ⇒ sums are final).
    - ``"sql"``     — posexplode to (dst, i, contrib), JVM hash aggregate,
      reassemble with array_sort(collect_list(struct(i, s))).
    - k separate scalar passes — benchmarked as ``pagerank_multi([s], "sql")``
      per seed (scripts/bench_widestate.py), the round-3 status quo.

    Fixed ``iters`` supersteps (the benchmark compares equal work; converged
    personalized ranks need ~20).  Returns ``(page_id, ranks array<double>)``
    with Σ_v ranks[v][i] = 1 per component.  Oracle:
    :func:`pagerank_multi_numpy_oracle` (tests assert allclose 1e-9 and
    csr == sql within 1e-12)."""
    from wikipath_spark.operators.bfs import wall_budget

    check_budget = wall_budget(budget_s, "pagerank_multi")
    seeds = [int(s) for s in dict.fromkeys(seeds)]
    if not seeds:
        raise ValueError("pagerank_multi: seeds must be non-empty")
    k = len(seeds)
    spark = edges.sparkSession
    n_edges = edges.count()
    with loop_confs(spark, rows=n_edges) as sc_parts:
        if vertices is None:
            vertices = (
                edges.select(F.col("src").alias("page_id"))
                .union(edges.select(F.col("dst").alias("page_id")))
                .distinct()
            )
        vertices = vertices.select("page_id")
        if vertices.isEmpty():
            return vertices.withColumn("ranks", F.lit(None).cast("array<double>"))

        out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
        contrib_edges = (
            edges.join(out_deg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
            .repartition(sc_parts, "src")
            .persist()
        )
        contrib_edges.count()

        srcs = edges.select("src").distinct()
        # static per-vertex frame: dangling flag + teleport basis vector
        # slot[i] = 1.0 iff v == seeds[i] (k seed columns folded into one array)
        slot = F.array(
            *[F.when(F.col("page_id") == s, 1.0).otherwise(0.0) for s in seeds]
        )
        vflag = checkpoint_tracked(
            vertices.join(srcs, vertices["page_id"] == srcs["src"], "left")
            .select(
                "page_id",
                F.col("src").isNull().alias("is_dangling"),
                slot.alias("slot"),
            )
            .repartition(sc_parts, "page_id")
        )
        n_seed_hits = vflag.agg(
            F.sum(F.aggregate("slot", F.lit(0.0), lambda a, x: a + x))
        ).collect()[0][0]
        if int(n_seed_hits or 0) != k:
            raise ValueError(
                f"pagerank_multi: {k - int(n_seed_hits)} seed(s) not in the "
                "vertex set — personalization mass would leak"
            )

        ranks = checkpoint_tracked(
            vflag.select("page_id", "is_dangling", "slot", F.col("slot").alias("ranks"))
        )
        # dangling mass per component rides the checkpointing pass: k scalar
        # aggregates (element_at is a cheap array index, k is small)
        dm_row = ranks.agg(
            *[
                F.sum(
                    F.when(F.col("is_dangling"), F.element_at("ranks", i + 1)).otherwise(0.0)
                ).alias(f"dm{i}")
                for i in range(k)
            ]
        ).collect()[0]
        dm = [float(dm_row[f"dm{i}"] or 0.0) for i in range(k)]

        try:
            for it in range(1, iters + 1):
                check_budget()
                joined = contrib_edges.join(
                    ranks, contrib_edges["src"] == ranks["page_id"]
                )
                msgs = joined.select(
                    "dst",
                    F.transform("ranks", lambda x: x * F.col("w")).alias("vec"),
                )
                if impl == "csr":
                    sums = (
                        msgs.withColumn("_b", F.pmod(F.xxhash64("dst"), F.lit(sc_parts)))
                        .groupBy("_b")
                        .applyInPandas(
                            lambda pdf: _csr_partial_vecsum(pdf[["dst", "vec"]]),
                            schema="dst long, vec array<double>",
                        )
                    )
                else:
                    sums = (
                        msgs.select("dst", F.posexplode("vec").alias("i", "c"))
                        .groupBy("dst", "i")
                        .agg(F.sum("c").alias("s"))
                        .groupBy("dst")
                        .agg(
                            F.array_sort(F.collect_list(F.struct("i", "s"))).alias("p")
                        )
                        .select("dst", F.transform("p", lambda st: st["s"]).alias("vec"))
                    )
                new_vec = F.array(
                    *[
                        F.lit(1.0 - damping) * F.element_at("slot", i + 1)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.element_at("vec", i + 1), F.lit(0.0))
                            + F.lit(dm[i]) * F.element_at("slot", i + 1)
                        )
                        for i in range(k)
                    ]
                )
                obs = Observation(f"prm_{it}")
                new_ranks = checkpoint_tracked(
                    ranks.join(sums, ranks["page_id"] == sums["dst"], "left")
                    .select("page_id", "is_dangling", "slot", new_vec.alias("ranks"))
                    .observe(
                        obs,
                        *[
                            F.sum(
                                F.when(
                                    F.col("is_dangling"), F.element_at("ranks", i + 1)
                                ).otherwise(0.0)
                            ).alias(f"dm{i}")
                            for i in range(k)
                        ],
                    )
                )
                metrics = obs.get
                dm = [float(metrics[f"dm{i}"] or 0.0) for i in range(k)]
                # drop the superseded state frame's checkpoint BLOCKS now —
                # waiting for driver GC leaves up to iters × |V| × k
                # checkpointed values cached simultaneously (plain
                # unpersist() is a no-op on localCheckpointed frames)
                release_checkpoint(ranks)
                ranks = new_ranks
        except BaseException:
            release_checkpoint(ranks)  # mid-loop abort: current state too
            raise
        finally:
            contrib_edges.unpersist()
            release_checkpoint(vflag)
        # the FINAL state frame stays checkpointed for the returned select;
        # its checkpoint ids ride on the result so a caller that is DONE can
        # free the blocks with release_checkpoint()
        out = ranks.select("page_id", "ranks")
        out._wps_ckpt_rdd_ids = getattr(ranks, "_wps_ckpt_rdd_ids", None) or set()
        return out


def pagerank_multi_numpy_oracle(edge_list, seeds, n=None, damping=0.85, iters=20):
    """Driver-side numpy oracle for :func:`pagerank_multi` (tests only):
    per-seed personalized power iteration with identical semantics."""
    edges = np.asarray(edge_list, dtype=np.int64)
    ids = np.unique(edges) if n is None else np.arange(n)
    idx = {v: i for i, v in enumerate(ids)}
    src = np.array([idx[s] for s, _ in edges])
    dst = np.array([idx[d] for _, d in edges])
    nn, k = len(ids), len(seeds)
    out_deg = np.bincount(src, minlength=nn)
    slot = np.zeros((nn, k))
    for i, s in enumerate(seeds):
        slot[idx[int(s)], i] = 1.0
    r = slot.copy()
    dangling = out_deg == 0
    for _ in range(iters):
        dm = r[dangling].sum(axis=0)
        contrib = np.zeros((nn, k))
        np.add.at(contrib, dst, r[src] / out_deg[src, None])
        r = (1.0 - damping) * slot + damping * (contrib + slot * dm[None, :])
    return {int(v): r[i].tolist() for v, i in idx.items()}


def pagerank_multi_fixedpoint(
    edges: DataFrame,
    seeds: list[int],
    vertices: DataFrame | None = None,
    iters: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    impl: str = "csr",
) -> DataFrame:
    """Bit-portable integer twin of :func:`pagerank_multi`: k single-seed
    personalized fixed-point PageRank walks as ONE vector loop — per-vertex
    state is a length-k ``array<long>``, component i seeded at ``seeds[i]``
    (jump set = {seeds[i]}, n = 1), with EXACT int64 arithmetic term-for-term
    identical to :func:`pagerank_fixedpoint`:

    - r0[i](v)  = scale · [v = sᵢ]
    - contrib   = rank div out_deg                       (per edge, per i)
    - dmᵢ       = Σ rank[i](v) over dangling v
    - r'[i](v)  = [v = sᵢ] · (jump + (num·dmᵢ) div den) + (num·msumᵢ) div den
      with jump = ((den−num)·scale) div den

    Because integer sums commute and truncating division is deterministic,
    ANY aggregation strategy produces the same bits — so running this with
    ``impl="csr"`` hash-verifies the Arrow 2-D scatter-add kernel itself
    against a DuckDB SQL twin (driver query ``graph_pagerank_multi_fixed``),
    closing the rows-only gap of the float vector kernel exactly the way
    ``graph_pagerank_fixed`` closed the scalar one.  Returns
    ``(page_id, ranks array<long>)``."""
    seeds = [int(s) for s in dict.fromkeys(seeds)]
    if not seeds:
        raise ValueError("pagerank_multi_fixedpoint: seeds must be non-empty")
    k = len(seeds)
    spark = edges.sparkSession
    n_edges = edges.count()
    jump = ((damping_den - damping_num) * scale) // damping_den  # n = 1
    with loop_confs(spark, rows=n_edges) as sc_parts:
        if vertices is None:
            vertices = (
                edges.select(F.col("src").alias("page_id"))
                .union(edges.select(F.col("dst").alias("page_id")))
                .distinct()
            )
        vertices = vertices.select("page_id")
        if vertices.isEmpty():
            return vertices.withColumn("ranks", F.lit(None).cast("array<long>"))
        out_deg = edges.groupBy("src").agg(F.count("*").alias("od"))
        edges_od = (
            edges.select("src", "dst").join(out_deg, "src")
            .repartition(sc_parts, "src")
            .persist()
        )
        edges_od.count()
        srcs = edges.select("src").distinct()
        slot = F.array(
            *[
                F.when(F.col("page_id") == s, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
                for s in seeds
            ]
        )
        vflag = checkpoint_tracked(
            vertices.join(srcs, vertices["page_id"] == srcs["src"], "left")
            .select(
                "page_id",
                F.col("src").isNull().alias("is_dangling"),
                slot.alias("slot"),
            )
            .repartition(sc_parts, "page_id")
        )
        n_hits = vflag.agg(
            F.sum(F.aggregate("slot", F.lit(0).cast("long"), lambda a, x: a + x))
        ).collect()[0][0]
        if int(n_hits or 0) != k:
            raise ValueError(
                f"pagerank_multi_fixedpoint: {k - int(n_hits)} seed(s) not in "
                "the vertex set — personalization mass would leak"
            )
        ranks = checkpoint_tracked(
            vflag.select(
                "page_id",
                "is_dangling",
                "slot",
                F.transform("slot", lambda x: x * scale).alias("ranks"),
            )
        )
        dm_row = ranks.agg(
            *[
                F.sum(
                    F.when(F.col("is_dangling"), F.element_at("ranks", i + 1))
                    .otherwise(F.lit(0).cast("long"))
                ).alias(f"dm{i}")
                for i in range(k)
            ]
        ).collect()[0]
        dm = [int(dm_row[f"dm{i}"] or 0) for i in range(k)]
        try:
            for it in range(1, iters + 1):
                joined = edges_od.join(ranks, edges_od["src"] == ranks["page_id"])
                msgs = joined.select(
                    "dst", F.expr("transform(ranks, x -> x div od)").alias("vec")
                )
                if impl == "csr":
                    sums = (
                        msgs.withColumn("_b", F.pmod(F.xxhash64("dst"), F.lit(sc_parts)))
                        .groupBy("_b")
                        .applyInPandas(
                            lambda pdf: _csr_partial_vecsum(pdf[["dst", "vec"]]),
                            schema="dst long, vec array<long>",
                        )
                    )
                else:
                    sums = (
                        msgs.select("dst", F.posexplode("vec").alias("i", "c"))
                        .groupBy("dst", "i")
                        .agg(F.sum("c").alias("s"))
                        .groupBy("dst")
                        .agg(F.array_sort(F.collect_list(F.struct("i", "s"))).alias("p"))
                        .select("dst", F.transform("p", lambda st: st["s"]).alias("vec"))
                    )
                # seed term computed in exact Python ints per component
                seed_terms = [
                    jump + (damping_num * dm[i]) // damping_den for i in range(k)
                ]
                new_vec = F.array(
                    *[
                        F.element_at("slot", i + 1) * F.lit(seed_terms[i]).cast("long")
                        + F.expr(
                            f"({damping_num} * coalesce(element_at(vec, {i + 1}), 0L)) "
                            f"div {damping_den}"
                        )
                        for i in range(k)
                    ]
                )
                obs = Observation(f"prmf_{it}")
                new_ranks = checkpoint_tracked(
                    ranks.join(sums, ranks["page_id"] == sums["dst"], "left")
                    .select("page_id", "is_dangling", "slot", new_vec.alias("ranks"))
                    .observe(
                        obs,
                        *[
                            F.sum(
                                F.when(
                                    F.col("is_dangling"), F.element_at("ranks", i + 1)
                                ).otherwise(F.lit(0).cast("long"))
                            ).alias(f"dm{i}")
                            for i in range(k)
                        ],
                    )
                )
                metrics = obs.get
                dm = [int(metrics[f"dm{i}"] or 0) for i in range(k)]
                release_checkpoint(ranks)  # same discipline as the float loop
                ranks = new_ranks
        except BaseException:
            release_checkpoint(ranks)
            raise
        finally:
            edges_od.unpersist()
            release_checkpoint(vflag)
        # the FINAL state frame stays checkpointed for the returned select;
        # its checkpoint ids ride on the result so a caller that is DONE can
        # free the blocks with release_checkpoint()
        out = ranks.select("page_id", "ranks")
        out._wps_ckpt_rdd_ids = getattr(ranks, "_wps_ckpt_rdd_ids", None) or set()
        return out
