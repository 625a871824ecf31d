"""Graph build pipeline: source table → ``pages`` / ``redirects`` / ``edges``.

The Spark re-expression of the reference's whole build (build.rs:19-134):

1. extract references + aliases from ``content`` (Arrow-batched pandas UDF ≈
   the regex extractors, parse.rs:174-387),
2. assign dense page ids (≈ title→id map, parse.rs:174-212; dense so CSR
   kernels can index numpy arrays, cf. the BTreeMap density note
   database.rs:252),
3. resolve reference targets by (repo, path) — inner join, dangling refs
   drop out (P4, parse.rs:354-358),
4. compress the alias map (G1, parse.rs:541-608),
5. resolve both edge endpoints through the compressed map with identity
   fallback (J4, parse.rs:360-361), drop self-links (P3, parse.rs:363-365),
   dedup (A2, database.rs:231-242) → one distinct ``(src, dst)`` edge table
   replacing the reference's incoming+outgoing LMDB pair (either adjacency
   is a groupBy away).

Parse-statistics counters (A5/A6, parse.rs:500-534) ride along via
``df.observe`` — no extra jobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wikipath_spark.functions.extract import extract_refs_sql, extract_refs_udf, sha256_col
from wikipath_spark.operators.compress import compress_redirects, resolve_through


@dataclass
class GraphTables:
    pages: DataFrame      # (page_id, repo, path, lang, commit, content_sha256, is_alias)
    redirects: DataFrame  # (src, dst) — compressed
    edges: DataFrame      # (src, dst) — resolved, self-free, distinct
    stats: dict = field(default_factory=dict)


_SHARD_TARGET_ROWS = 8_000_000  # max rows one dense-id window task should sort
_DRIVER_OFFSET_LIMIT = 100_000  # (repos × shards) rows above which offsets go distributed
_BROADCAST_PAGES_ROWS = 5_000_000  # id-probe side broadcast cap (~350 MB framed)


def assign_dense_ids(
    df: DataFrame,
    partition_col: str = "repo",
    order_cols: tuple[str, ...] = ("path",),
    id_col: str = "page_id",
    shards: int | None = None,
    dup_flag_col: str | None = None,
) -> DataFrame:
    """Deterministic dense 0..N-1 ids without a global window.

    Two-level scheme: rows are sharded by (partition_col, hash-bucket of the
    order columns) so even a single mega repo fans out across ``shards``
    window tasks; per-shard ``row_number`` plus base offsets (a cumulative
    sum over the #repos × shards counts) make ids globally dense.
    Ids are deterministic (hash shard + in-shard ordering are both
    data-derived) but not path-ordered across shards — density is the
    requirement (CSR kernels, the BTreeMap-density analogue database.rs:252),
    not order; the reference's dump-assigned PageIds are unordered too.
    PageId is u32 in the reference (database.rs:11); we use LongType
    (Spark has no unsigned 32-bit).

    Offsets: up to ``_DRIVER_OFFSET_LIMIT`` count rows they are accumulated
    on the driver and broadcast (one tiny collect).  Above that — millions
    of repos at 10^12-file scale — the SAME cumulative sum runs as a window
    over the counts frame (global order (partition_col, _shard); one sort
    task over #groups rows, never driver memory) and joins back by shuffle.
    Both paths produce identical ids (same order, same prefix sums); the
    probe is a sorted ``limit(L+1)`` collect, so the common path spends no
    extra job.

    ``shards=None`` auto-scales: start at 16; if the first per-(partition,
    shard) count scan finds any shard above ``_SHARD_TARGET_ROWS`` rows, the
    shard count is re-derived from the observed maximum and the counts are
    recomputed once.  Ids depend only on the data (the escalation decision is
    a pure function of the counts), never on cluster parallelism — at
    10^12-file scale a single mega-repo escalates to enough shards that no
    window task sorts more than the target, at the cost of one extra pass.
    """
    auto = shards is None
    shards = 16 if auto else shards
    spark = df.sparkSession
    probe_limit = _DRIVER_OFFSET_LIMIT

    def _counts(n_shards: int):
        shard = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_shards))
        sharded = df.withColumn("_shard", shard)
        counts = sharded.groupBy(partition_col, "_shard").count()
        # ordered limit(L+1): if fewer than L+1 rows come back we hold the
        # FULL ordered count set (limit returns everything when the input is
        # smaller) — the driver path costs exactly the old collect; L+1 rows
        # back means "too many groups", switch to the distributed offsets
        rows = counts.orderBy(partition_col, "_shard").limit(probe_limit + 1).collect()
        return sharded, counts, rows

    sharded, counts, rows = _counts(shards)
    if auto:
        if len(rows) <= probe_limit:
            max_rows = max((r["count"] for r in rows), default=0)
        else:
            max_rows = counts.agg(F.max("count")).collect()[0][0] or 0
        if max_rows > _SHARD_TARGET_ROWS:
            shards = shards * (-(-max_rows // _SHARD_TARGET_ROWS))
            sharded, counts, rows = _counts(shards)

    if len(rows) <= probe_limit:
        offsets, base = [], 0
        for row in rows:
            offsets.append((row[partition_col], row["_shard"], base))
            base += row["count"]
        off_df = F.broadcast(
            spark.createDataFrame(offsets, f"{partition_col} string, _shard long, _base long")
        )
    else:
        # distributed prefix sum: exclusive running total in the SAME global
        # order the driver loop uses — identical _base values (tested)
        wo = (
            Window.orderBy(partition_col, "_shard")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        off_df = counts.select(
            partition_col,
            "_shard",
            F.coalesce(F.sum("count").over(wo), F.lit(0)).cast("long").alias("_base"),
        )
    w = Window.partitionBy(partition_col, "_shard").orderBy(*order_cols)
    out = sharded.join(off_df, [partition_col, "_shard"]).withColumn(
        id_col, F.row_number().over(w) + F.col("_base") - 1
    )
    if dup_flag_col is not None:
        # duplicate-(partition, order)-key detector riding the SAME window
        # sort: equal order keys hash to the same shard and sort adjacently,
        # so lag-equality flags every duplicate beyond the first — zero
        # extra shuffle, lets the caller observe conflicts on the
        # materializing pass instead of running a groupBy job (A7)
        dup = F.lag(F.struct(*[F.col(c) for c in order_cols])).over(w) == F.struct(
            *[F.col(c) for c in order_cols]
        )
        out = out.withColumn(dup_flag_col, F.coalesce(dup, F.lit(False)))
    return out.drop("_base", "_shard")


def build_graph(
    spark: SparkSession,
    repos_df: DataFrame,
    extractor: str = "pandas",
    broadcast_redirects: bool = True,
    with_stats: bool = False,
    check_conflicts: bool = True,
) -> GraphTables:
    """Run the full build. ``extractor`` ∈ {"pandas", "sql"} (identical
    semantics; pandas is the mandated Arrow path, sql the JVM benchmark).
    ``check_conflicts``: fail on duplicate (repo, path) source rows — A7,
    parse.rs:203-209 parity."""
    extract = extract_refs_udf if extractor == "pandas" else extract_refs_sql

    extracted = repos_df.select(
        "repo",
        "path",
        "commit",
        "lang",
        extract(F.col("content"), F.col("lang")).alias("_x"),
        sha256_col(F.col("content")).alias("content_sha256"),
    )
    # materialize the extraction ONCE: dense-id assignment scans its input
    # twice (per-shard counts, then the window pass), and without a barrier
    # the source scan + regex extraction — the most expensive stage of the
    # whole build at scale — would run twice.  `content` is already projected
    # away, so the checkpoint holds only refs/alias/sha columns.
    extracted = extracted.localCheckpoint(eager=True)

    page_rows = extracted.select(
        "repo",
        "path",
        "lang",
        "commit",
        "content_sha256",
        F.col("_x.alias").isNotNull().alias("is_alias"),
        F.col("_x.refs").alias("_refs"),
        F.col("_x.alias").alias("_alias"),
        F.col("_x.truncated").alias("_truncated"),
    )
    # parse-stats counters piggyback on the first materialization — the
    # analogue of the reference's per-file counter block (A6, parse.rs:500-534)
    obs = Observation("parse_stats") if with_stats else None
    if obs is not None:
        page_rows = page_rows.observe(
            obs,
            F.count(F.lit(1)).alias("pages"),
            F.sum(F.when(F.col("is_alias"), 1).otherwise(0)).alias("aliases"),
            F.sum(F.size("_refs")).alias("raw_refs"),
            F.sum(F.when(F.col("_truncated"), 1).otherwise(0)).alias("truncated_rows"),
        )
    # conflict detection (A7, parse.rs:203-209) rides the dense-id window
    # pass as a lag-equality flag + observe on the pages materialization —
    # the previous groupBy+limit+collect job over the window output was the
    # single most expensive build step at bench scale (measured 7.4s of a
    # 24s cold build; the count() below materializes the same cache in ~1s)
    conflict_obs = Observation("conflicts") if check_conflicts else None
    assigned = assign_dense_ids(
        page_rows, dup_flag_col="_dup" if check_conflicts else None
    )
    if check_conflicts:
        assigned = assigned.observe(
            conflict_obs, F.sum(F.col("_dup").cast("long")).alias("dups")
        ).drop("_dup")
    pages = assigned.persist()
    n_pages = pages.count()  # materializes the cache + collects the observes

    if check_conflicts and int(conflict_obs.get["dups"] or 0) > 0:
        # rare failure path: re-derive one offending key for the message
        r = (
            pages.groupBy("repo", "path").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1).limit(1).collect()[0]
        )
        raise ValueError(
            f"conflicting source rows: ({r['repo']}, {r['path']}) appears {r['n']} times"
        )

    id_by_path = pages.select("repo", "path", "page_id")
    # the (repo, path) → id probes below are equi-joins against the full
    # page table; broadcast it while it fits (the bench-scale estimate from
    # Catalyst is opaque behind the cache + window, so SMJ both sides
    # otherwise) and fall back to shuffle joins above the row cap — the
    # broadcast gate a 100 TB build needs anyway
    if n_pages <= _BROADCAST_PAGES_ROWS:
        id_by_path = F.broadcast(id_by_path)

    # alias rows → raw redirects; dangling alias targets drop out via the
    # inner join, like every unresolvable (ns,title) probe (parse.rs:243-247)
    alias_rows = pages.filter(F.col("is_alias")).select(
        "repo", F.col("page_id").alias("src"), F.col("_alias").alias("_target_path")
    )
    tgt = id_by_path.select(
        "repo", F.col("path").alias("_target_path"), F.col("page_id").alias("dst")
    )
    redirects_raw = alias_rows.join(tgt, ["repo", "_target_path"], "inner").select("src", "dst")
    redirects = compress_redirects(redirects_raw).persist()

    # reference rows → raw edges
    refs = pages.select(
        "repo", F.col("page_id").alias("src"), F.explode("_refs").alias("_ref_path")
    )
    tgt2 = id_by_path.select(
        "repo", F.col("path").alias("_ref_path"), F.col("page_id").alias("dst")
    )
    resolved = refs.join(tgt2, ["repo", "_ref_path"], "inner").select("src", "dst")

    edges = (
        resolve_through(resolved, redirects, ["src", "dst"], broadcast=broadcast_redirects)
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )

    # alias pages are not graph vertices once compressed away; edges from an
    # alias page resolve to its target (parse.rs:360) — already handled above.
    pages_out = pages.drop("_refs", "_alias", "_truncated")

    stats: dict = {}
    if with_stats:
        resolved = resolved.persist()
        stats = {
            "resolved_refs": resolved.count(),
            "redirects_compressed": redirects.count(),
            "edges": edges.count(),
        }
        stats.update({k: int(v) for k, v in obs.get.items()})
        # dangling references dropped by the inner resolution join (P4)
        stats["dangling_dropped"] = stats["raw_refs"] - stats["resolved_refs"]
        resolved.unpersist()
    return GraphTables(pages=pages_out, redirects=redirects, edges=edges, stats=stats)
