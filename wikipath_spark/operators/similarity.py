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


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, cosine, rank).

    ``queries`` is a subset of ``embeddings`` (same schema); self-matches are
    excluded.  Brute force = one broadcast-able join of queries × corpus.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("emb_a")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("emb_b")
    )
    scored = with_cosine(q.crossJoin(c)).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_sign(vec_col, plane: int) -> F.Column:
    """Sign of <v, r_plane> where r_plane[d] = ±1 derived from md5(plane, d).

    Deterministic, data-independent, identical on any engine: component d of
    plane p is +1 iff the low bit of h60(p || ':' || d) is 1.
    """
    # zip vector with its index via transform over a sequence
    idx = F.sequence(F.lit(0), F.size(vec_col) - 1)
    signed = F.zip_with(
        vec_col,
        idx,
        lambda v, i: F.when(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{plane}:"), i.cast("string"))), 1, 15), 16, 10
            ).cast("bigint")
            % 2
            == 1,
            v,
        ).otherwise(-v),
    )
    total = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(total > 0, F.lit(1)).otherwise(F.lit(0))


def add_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", planes: int = 8, out: str = "bucket"
) -> DataFrame:
    """Bucket id = P-bit string of hyperplane signs."""
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.shiftleft(_hyperplane_sign(v, p).cast("long"), p)
    return df.withColumn(out, bucket)


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
    emb_b = add_lsh_bucket(embeddings, vec_col, planes)
    q_b = add_lsh_bucket(queries, vec_col, planes)
    q = q_b.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("emb_a"), "bucket")
    c = emb_b.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("emb_b"), "bucket")
    scored = with_cosine(q.join(c, "bucket")).filter(F.col("query_id") != F.col("neighbor_id"))
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
    left = b.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("emb_a"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("emb_b"), "bucket")
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        with_cosine(pairs)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
