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


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Vertices of the k-core with their in-core degree: ``(page_id, degree)``.

    ``edges`` is directed input; the core is computed on the symmetrized
    self-loop-free graph (degree = number of distinct neighbors).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_n = e.count()
    converged = prev_n == 0
    for i in range(max_iter):
        if converged:
            break
        deg = e.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u")
        obs = Observation(f"kcore_{i}")
        e2 = (
            e.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n2 = int(obs.get["n"] or 0)
        e = e2
        converged = n2 == prev_n or n2 == 0
        prev_n = n2
    if not converged and max_iter > 0:
        # peeling strictly shrinks until the fixpoint, so this means
        # max_iter rounds were not enough — the returned set OVER-approximates
        # the true k-core; never silent (same contract as components/LPA)
        warnings.warn(
            f"k_core: no fixpoint after {max_iter} rounds; "
            "result over-approximates the k-core (raise max_iter)",
            stacklevel=2,
        )
    return (
        e.groupBy("u")
        .agg(F.count("*").alias("degree"))
        .select(F.col("u").alias("page_id"), "degree")
    )
