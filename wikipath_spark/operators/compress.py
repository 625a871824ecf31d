"""Redirect/alias chain compression — pointer-jumping fixpoint.

Spark re-expression of the reference's ``compress_redirect_chains``
(parse.rs:541-608, fixtures parse.rs:743-850): flatten alias chains to their
terminal targets, remove self-redirects, and remove every chain that is part
of — or leads into — a cycle.

The reference does a memoized sequential walk per source with per-walk cycle
detection.  Distributed, we use **pointer doubling**: each iteration replaces
``dst`` with ``dst``'s own target when one exists, doubling the resolved
distance, so acyclic chains of length L flatten in ⌈log2 L⌉ iterations.
Chains touching a cycle never resolve to a terminal; after convergence (or
the log-bound cap) their ``dst`` still appears as a source, and one anti-join
removes them — exactly the reference's cycle semantics.

Scale: the redirect table is a small fraction of the page set (aliases are
rare), each iteration is one self-equi-join on ``dst = src`` — broadcastable
when small, shuffle-hash otherwise — and ``localCheckpoint`` truncates the
per-iteration lineage growth.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _compress_driver_side(rows: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Memoized sequential walk with per-walk cycle detection — the
    reference's own algorithm (parse.rs:541-608), exact semantics: chains
    flatten to terminals; self-redirects, cycle members, and every chain
    leading into a cycle resolve to ``None`` (dropped)."""
    nxt = dict(rows)
    resolved: dict[int, int | None] = {}
    for start in nxt:
        if start in resolved:
            continue
        path: list[int] = []
        on_path: set[int] = set()
        cur = start
        while True:
            if cur in resolved:
                val = resolved[cur]
                break
            if cur in on_path:  # walked into a cycle: the whole path dies
                val = None
                break
            if cur not in nxt:  # terminal
                val = cur
                break
            path.append(cur)
            on_path.add(cur)
            cur = nxt[cur]
        for p in path:
            resolved[p] = val
    return [(s, t) for s, t in resolved.items() if t is not None]


def compress_redirects(
    redirects: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int | None = None,
    checkpoint_every: int = 1,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Compress an alias map ``(src, dst)`` to terminal targets.

    Returns the compressed map: every surviving row points directly at a
    terminal (non-source) vertex; self-redirects and all cycle-touching
    chains are gone (parse.rs:756-804 semantics).

    Adaptive physical strategy: alias maps are a small fraction of the page
    set by nature, so up to ``driver_threshold`` rows the compression is the
    reference's own memoized driver-side walk (collect → walk → parallelize;
    exact, one pass).  Above it, distributed pointer doubling — note cycle
    rows never stabilize under pointer jumping (their dst rotates each
    round), so that path always runs its full ⌈log2 n⌉ cap when cycles
    exist; both paths produce identical results (tested)."""
    # NB: self-redirects are NOT pre-filtered — the reference treats x→x as a
    # 1-cycle, so chains *into* a self-redirect must also die (parse.rs:767-779
    # fixture: {1:2, 2:2} ⇒ both removed). A self-loop is stable under pointer
    # jumping and the final cycle anti-join removes it plus its feeders.
    r = redirects.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # size probe and driver-path input in ONE job: limit(threshold+1) returns
    # the COMPLETE row set whenever the input is smaller (and early-stops the
    # scan when it is not), so the common small-alias-map path pays a single
    # action instead of the old checkpoint + count + collect triple.  The walk
    # result is row-order independent (each chain's terminal is unique and
    # cycle membership is a property of the map, not the visit order).
    probe = r.limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        spark = redirects.sparkSession
        compressed = _compress_driver_side([(row.src, row.dst) for row in probe])
        return spark.createDataFrame(compressed or [], "src long, dst long")
    # distributed pointer doubling: NOW materialize once (every iteration
    # re-reads the full table) and take the exact count for the log2 cap
    r = r.localCheckpoint(eager=True)
    n = r.count()
    cap = max_iters if max_iters is not None else int(math.ceil(math.log2(n + 1))) + 2

    for it in range(cap):
        hop = r.select(F.col("src").alias("h_src"), F.col("dst").alias("h_dst"))
        # one action per iteration: the changed-count rides the checkpointing
        # pass via observe (was checkpoint + filter-count = 2 jobs/iteration)
        obs = Observation(f"compress_{it}")
        stepped = (
            r.join(hop, r["dst"] == hop["h_src"], "left")
            .select(
                "src",
                F.coalesce("h_dst", "dst").alias("dst"),
                (F.col("h_dst").isNotNull() & (F.col("h_dst") != F.col("dst"))).alias("_changed"),
            )
            .observe(obs, F.sum(F.col("_changed").cast("long")).alias("n"))
            .localCheckpoint(eager=True)
        )
        r = stepped.select("src", "dst")
        if int(obs.get["n"] or 0) == 0:
            break

    # Cycle residue: any row whose final dst is still a source never reached
    # a terminal → it is on, or feeds into, a cycle. Drop it (parse.rs:782-804).
    keys = r.select(F.col("src").alias("k")).distinct()
    return r.join(keys, r["dst"] == keys["k"], "left_anti")


def resolve_through(
    df: DataFrame,
    redirects: DataFrame,
    cols: list[str],
    broadcast: bool = True,
) -> DataFrame:
    """Map each id column through the compressed alias map with identity
    fallback — the reference's ``redirects.get(x).unwrap_or(x)`` applied to
    both endpoints (parse.rs:360-361).  Canonical left-join + coalesce (J4);
    the compressed map is broadcast when small.
    """
    r = redirects.select("src", "dst")
    if broadcast:
        r = F.broadcast(r)
    out = df
    for c in cols:
        rr = r.select(F.col("src").alias(f"_r_{c}"), F.col("dst").alias(f"_t_{c}"))
        out = (
            out.join(rr, out[c] == rr[f"_r_{c}"], "left")
            .withColumn(c, F.coalesce(f"_t_{c}", c))
            .drop(f"_r_{c}", f"_t_{c}")
        )
    return out
