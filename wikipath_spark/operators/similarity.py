"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring a production ANN layout:

- ``cosine_topk`` — exact brute-force top-k for a query subset; the dot
  product is `F.aggregate`/`F.zip_with` over zipped arrays (JVM-side, no
  UDF).  The correctness baseline.
- ``cosine_topk_lsh`` — random-hyperplane (sign) LSH: P deterministic
  pseudo-random hyperplanes derived from the portable md5 hash (no RNG, so
  buckets are reproducible anywhere), bucket join, exact re-rank inside the
  bucket.  The scale path: candidate set shrinks ~2^P-fold.
- ``embedding_near_dup_pairs`` — all pairs above a cosine threshold via the
  same bucket join (near-duplicate detection by embedding).

Ordering ties are broken by ascending neighbor id — required for exact
cross-engine/oracle agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, a: str = "emb_a", b: str = "emb_b", out: str = "cosine") -> DataFrame:
    """Adds a float64 cosine column (rounded to 6 for oracle hash parity)."""
    return df.withColumn(
        out,
        F.round(
            _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))),
            6,
        ),
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _probe_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col))).first()
    return int(row[0]) if row else 0


def _pair_cosine() -> F.Column:
    """Cosine from a pre-joined pair row (emb_a, emb_b, na, nb).  Norms are
    computed once per VECTOR before the join (each is an array fold;
    higher-order functions run interpreted, so folding per pair costs 3× per
    candidate) — identical arithmetic, identical rounding as with_cosine.
    Round-6 note: a flat 64-term codegen expression (Σ CAST(a[d])·CAST(b[d]))
    was A/B'd here and measured ~2.3× SLOWER than the interpreted fold
    (1.6s vs 3.8s warm on the sf0.1 cross join) — per-element GetArrayItem
    in generated code loses to the fold's single primitive-array pass, so
    the fold stays and the exact baseline moved to an Arrow kernel
    (:func:`cosine_topk`) instead."""
    return F.round(_dot(F.col("emb_a"), F.col("emb_b")) / (F.col("na") * F.col("nb")), 6)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, cosine, rank).

    ``queries`` is a subset of ``embeddings`` (same schema); self-matches are
    excluded.  Exact top-k inherently computes |Q|·|C| cosines.  Round-6
    physical plan (guide §4.2 — batch the per-pair math into native code):
    the query side — the BROADCAST side of the old nested-loop plan, small
    by definition — is collected once, and an Arrow kernel streams the
    corpus, accumulating every (corpus-row × query) dot product dimension by
    dimension in float64.  The d-ascending accumulation is the SAME IEEE
    evaluation order as the interpreted array fold it replaces, so dots and
    norms are bit-identical (oracle-hash-tested); each batch emits only the
    pairs that can still reach the global top k under a 2e-6 guard around
    the batch's kth best unrounded cosine (round-to-6 moves a value by at
    most 5e-7, so anything below the guard is strictly outside the rounded
    top k — proof in OPTIMIZATION_r06.md), and the EXACT rounded cosine,
    ranking and tie-break run in Spark SQL on the kernel's (dot, na, nb) —
    the same expressions the old plan evaluated per pair."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    spark = embeddings.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    dim = Q.shape[1]

    def seq_norm(M: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(M.shape[0], dtype=np.float64)
        for d in range(M.shape[1]):
            acc = acc + M[:, d] * M[:, d]
        return np.sqrt(acc)

    qn = seq_norm(Q)
    guard = 2e-6

    def kernel(batches):
        for b in batches:
            if not len(b):
                continue
            C = np.array(b[vec_col].tolist(), dtype=np.float64)
            cids = b[id_col].to_numpy(dtype=np.int64)
            cn = seq_norm(C)
            acc = np.zeros((C.shape[0], Q.shape[0]), dtype=np.float64)
            for d in range(dim):
                acc = acc + C[:, d : d + 1] * Q[None, :, d]
            cos = acc / (qn[None, :] * cn[:, None])
            cos[cids[:, None] == qids[None, :]] = -np.inf  # self-matches out
            nc = cos.shape[0]
            if nc > k:
                kth = np.partition(cos, nc - k, axis=0)[nc - k]
            else:
                kth = np.full(Q.shape[0], -np.inf)
            keep = (cos >= (kth[None, :] - guard)) & (cids[:, None] != qids[None, :])
            ri, ci = np.nonzero(keep)
            yield pd.DataFrame({
                "query_id": qids[ci], "neighbor_id": cids[ri],
                "dot": acc[ri, ci], "na": qn[ci], "nb": cn[ri],
            })

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        kernel, schema="query_id long, neighbor_id long, dot double, na double, nb double"
    ).withColumn("cosine", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


_PLANE_MAX_DIM = 512


def _plane_signs(plane: int, dim: int) -> list[float]:
    """±1 components of pseudo-random hyperplane ``plane``: component d is
    +1 iff the low bit of h60(f"{plane}:{d}") is 1.  Deterministic and
    engine-independent; evaluated HERE (driver, plan-build time) because the
    vector is data-independent — deriving it per row cost one md5 per vector
    element per plane in interpreted lambdas (measured: the entire LSH query
    cost was this derivation)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:15], 16) % 2 == 1
        else -1.0
        for d in range(dim)
    ]


def _hyperplane_sign_sql(vec_col: str, plane: int, dim: int) -> str:
    """Sign of <v, r_plane> as a FLAT scalar SQL fragment Σ_d ±v[d]: no
    higher-order functions (array-lambda folds are interpreted per element —
    measured 5-10× slower on the same data), and assembled as ONE string so
    the driver issues a single parse instead of ~dim×planes py4j Column calls
    (measured: 6s of plan-building per query at dim=64, planes=8)."""
    terms = "".join(
        f" {'+' if s > 0 else '-'} CAST({vec_col}[{d}] AS DOUBLE)"
        for d, s in enumerate(_plane_signs(plane, dim))
    )
    return f"(CASE WHEN (0.0D{terms}) > 0D THEN 1L ELSE 0L END)"


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: int = 8,
    out: str = "bucket",
    dim: int | None = None,
) -> DataFrame:
    """Bucket id = P-bit string of hyperplane signs.  ``dim`` (the embedding
    dimensionality) is read from the first row when not given — the plane
    sign pattern is baked into the plan as constants."""
    if dim is None:
        row = df.select(F.size(F.col(vec_col))).first()
        dim = int(row[0]) if row else 0
    if dim > _PLANE_MAX_DIM:
        raise ValueError(f"embedding dim {dim} exceeds supported {_PLANE_MAX_DIM}")
    bucket = " + ".join(
        f"(shiftleft({_hyperplane_sign_sql(vec_col, p, dim)}, {p}))" for p in range(planes)
    )
    return df.withColumn(out, F.expr(f"CAST({bucket} AS BIGINT)"))


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine re-rank within it.  Recall rises with fewer planes."""
    dim = _probe_dim(embeddings, vec_col)
    emb_b = add_lsh_bucket(embeddings, vec_col, planes, dim=dim)
    q_b = add_lsh_bucket(queries, vec_col, planes, dim=dim)
    q = q_b.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("emb_a"), "bucket"
    ).withColumn("na", _norm(F.col("emb_a")))
    c = emb_b.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("emb_b"), "bucket"
    ).withColumn("nb", _norm(F.col("emb_b")))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _pair_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _l2_sql(vec_col: str, centroid: list[float]) -> str:
    """Squared L2 distance to a constant centroid as ONE flat SQL fragment
    (codegen-able; no higher-order functions, no per-term py4j calls)."""
    return "(" + " + ".join(
        f"(CAST({vec_col}[{d}] AS DOUBLE) - ({c!r})) * (CAST({vec_col}[{d}] AS DOUBLE) - ({c!r}))"
        for d, c in enumerate(centroid)
    ) + ")"


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    train_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd iterations for the IVF coarse quantizer.

    Init = the ``n_centroids`` vectors with smallest xxhash64(id) (a
    partitioning-independent hash sample).  Each iteration assigns every
    vector to its nearest centroid (flat argmin expression, centroids baked
    in as constants) and recomputes per-centroid dimension means with one
    posexplode + groupBy — the collected update is n_centroids × dim rows.
    Floating means keep Spark's partial-aggregation summation order, so
    centroid LSBs can differ across partitionings — assignments are stable
    except for exact-boundary ties (measure recall, not bit-equality)."""
    init = (
        embeddings.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .withColumn("_h", F.xxhash64(F.col("id")))
        .orderBy("_h", "id")
        .limit(n_centroids)
        .collect()
    )
    centroids = [list(r.v) for r in init]
    for _ in range(train_iters):
        assigned = _assign_centroid(embeddings, centroids, vec_col)
        means = (
            assigned.select("_cid", F.posexplode(_as_double(F.col(vec_col))).alias("_pos", "_val"))
            .groupBy("_cid", "_pos")
            .agg(F.avg("_val").alias("_m"))
            .collect()
        )
        new = {int(r._cid): dict() for r in means}
        for r in means:
            new[int(r._cid)][int(r._pos)] = float(r._m)
        centroids = [
            [new[c][d] for d in range(len(centroids[c]))] if c in new else centroids[c]
            for c in range(len(centroids))  # empty centroids keep their position
        ]
    return centroids


def _assign_centroid(df: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """Adds ``_cid`` = argmin squared-L2 centroid, via an array_min over
    (distance, cid) structs — one SQL expression, ties to the lower cid."""
    pairs = ", ".join(
        f"struct({_l2_sql(vec_col, c)} AS d, {i} AS cid)" for i, c in enumerate(centroids)
    )
    return df.withColumn("_cid", F.expr(f"array_min(array({pairs})).cid"))


def _probe_centroids(df: DataFrame, centroids: list[list[float]], vec_col: str, nprobe: int) -> DataFrame:
    """Adds ``_cid`` exploded to the ``nprobe`` nearest centroids per row."""
    pairs = ", ".join(
        f"struct({_l2_sql(vec_col, c)} AS d, {i} AS cid)" for i, c in enumerate(centroids)
    )
    probes = f"transform(slice(array_sort(array({pairs})), 1, {nprobe}), p -> p.cid)"
    return df.withColumn("_cid", F.explode(F.expr(probes)))


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    train_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse k-means quantizer → per-centroid
    inverted lists → queries probe their ``nprobe`` nearest lists → exact
    cosine re-rank inside the probed candidates.

    The candidate set shrinks ~n_centroids/nprobe-fold versus brute force;
    recall rises with ``nprobe`` (= exact when nprobe = n_centroids).  Pass
    pre-trained ``centroids`` to amortize training across queries — at scale
    the quantizer is trained once on a sample and reused."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, train_iters, id_col, vec_col
        )
    corpus = _assign_centroid(embeddings, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("emb_b"),
        "_cid",
    ).withColumn("nb", _norm(F.col("emb_b")))
    probes = _probe_centroids(queries, centroids, vec_col, nprobe).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("emb_a"),
        "_cid",
    ).withColumn("na", _norm(F.col("emb_a")))
    scored = (
        probes.join(corpus, "_cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _pair_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, generated through the LSH bucket
    join (near-identical vectors agree on every hyperplane with high
    probability)."""
    b = add_lsh_bucket(embeddings, vec_col, planes)
    left = b.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("emb_a"), "bucket"
    ).withColumn("na", _norm(F.col("emb_a")))
    right = b.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("emb_b"), "bucket"
    ).withColumn("nb", _norm(F.col("emb_b")))
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", _pair_cosine())
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
