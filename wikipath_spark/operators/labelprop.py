"""Synchronous label propagation (community detection).

New capability per the north rule (no reference counterpart).  Standard
synchronous LPA over the undirected graph: every vertex starts with its own
id as label; each superstep adopts the most frequent label among neighbors,
ties broken by **minimum label** — the deterministic tie-break required for
exact reproducibility across parallelism levels (SURVEY.md §4.4).

Each superstep is one explicit shuffle: ``labels ⋈ edges`` then a two-level
aggregation ``groupBy(dst, label).count`` → ``groupBy(dst).max(struct)``.
The struct-max trick — ``max(struct(cnt, -label))`` — picks
(max count, then min label) in a single algebraic aggregate: no window
function, fully map-side combinable, skew-safe for hubs.

Synchronous LPA can oscillate on bipartite-ish structures; ``max_iter`` caps
the loop and the stable-count convergence test stops early when labels stop
changing. Deterministic by construction either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    checkpoint_every: int = 1,
    checkpoint_mgr=None,
    checkpoint_interval: int = 3,
    resume: bool = False,
) -> DataFrame:
    """Returns ``(page_id, label)``; label = a community representative id."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("u").alias("page_id")).distinct().withColumn(
        "label", F.col("page_id")
    ).persist()
    start_it = 0
    if checkpoint_mgr is not None and resume:
        latest = checkpoint_mgr.latest()
        if latest is not None:
            loaded, _ = checkpoint_mgr.load(edges.sparkSession, latest)
            labels.unpersist()
            labels = loaded.select("page_id", "label").persist()
            start_it = latest

    # AQE left on: like CC (and unlike PageRank's fixed-shape superstep),
    # message volume varies round to round as labels converge
    for it in range(start_it + 1, max_iter + 1):
        msgs = sym.join(labels, sym["v"] == labels["page_id"]).select(
            sym["u"].alias("id"), "label"
        )
        counted = msgs.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        picked = (
            counted.groupBy("id")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("b"))
            .select(F.col("id").alias("page_id"), (-F.col("b.nl")).alias("label"))
        )
        new_labels = picked
        if it % checkpoint_every == 0:
            # eager lineage truncation each superstep (measured in
            # PageRank: letting the plan grow dominates iteration cost)
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "page_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if checkpoint_mgr is not None and (it % checkpoint_interval == 0 or changed == 0):
            checkpoint_mgr.save(it, labels, float(changed))
        if changed == 0:
            break
    sym.unpersist()
    return labels
