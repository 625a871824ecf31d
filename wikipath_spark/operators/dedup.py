"""Deduplication operators for training-data pipelines.

Five families, each expressed as declarative DataFrame plans (Catalyst gets
pushdown/broadcast/AQE for free) over a ``(id, text)`` document table:

- exact:          hash-groupBy on the full text
- minhash LSH:    char-shingles → k minhashes → banded bucket join →
                  candidate pairs → exact Jaccard verify
- simhash:        60-bit fingerprint, banded bucketing, Hamming verify
- n-gram Jaccard: inverted-index pair generation + set-overlap ratio
- embedding:      cosine near-duplicates (see operators/similarity.py)

Hashing uses the portable ``h60`` (md5-based) so every step has a DuckDB
oracle twin.  Scale notes: pair generation always goes through a bucket join
(LSH bands / shared-ngram inverted index), never a cross join; hot buckets
(stopword-like shingles) are capped by frequency filtering, the standard
posting-list-truncation trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikipath_spark.functions.text import char_ngrams, h60, simhash60


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: keeper = min id, plus duplicate count."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("dup_count"))
        .select("keeper_id", "dup_count")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 4) -> DataFrame:
    """Distinct char n-gram shingles per document: (id, shingle)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(char_ngrams(F.col(text_col), n))).alias("sh"),
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8, n: int = 4
) -> DataFrame:
    """(id, m0..m{k-1}) minhash signature columns."""
    sh = shingles(df, id_col, text_col, n)
    aggs = [F.min(h60(F.col("sh"), seed)).alias(f"m{seed}") for seed in range(k)]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    n: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 512,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded minhash LSH.

    k minhashes split into ``bands`` bands of k/bands rows; docs sharing any
    band bucket become candidates; candidates are verified with the exact
    shingle Jaccard (so the threshold is exact, LSH only prunes).

    ``max_bucket`` drops buckets larger than that from pair generation — the
    posting-truncation guard against quadratic blowup when a vocabulary-dense
    corpus collides whole clusters into one band bucket.  Raise rows-per-band
    (k/bands) rather than max_bucket to reduce collisions without recall loss.
    """
    rows = k // bands
    # shingle sets are the shared input of BOTH signature derivation and the
    # exact-Jaccard verify — compute once, persist, reuse (at sf0.1 this
    # halved the query: the shingle explode is the dominant cost)
    sh = shingles(df, id_col, text_col, n).persist()
    aggs = [F.min(h60(F.col("sh"), seed)).alias(f"m{seed}") for seed in range(k)]
    sig = sh.groupBy("id").agg(*aggs)
    band_keys = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[F.col(f"m{b * rows + r}") for r in range(rows)])).alias("key"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("id", F.explode(F.array(*band_keys)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    ok = (
        buckets.groupBy("band", "key")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") <= max_bucket)
        .select("band", "key")
    )
    buckets = buckets.join(ok, ["band", "key"], "left_semi")
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cand, sh, jaccard_threshold)


def _verify_jaccard(pairs: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over a pre-computed ``(id, sh)`` shingle frame."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    # intersection size: both shingle-set joins are pure equi-joins — the
    # shingle value is part of the second join key, so the hash join emits
    # |A∩B| rows per pair instead of |A|×|B| rows filtered afterwards
    inter = (
        pairs.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    threshold: float = 0.5,
    max_posting: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity ≥ threshold via inverted index.

    ``max_posting`` drops shingles appearing in more than that many docs
    (stop-shingles) from *pair generation only* — verification still uses
    full sets, so results below the threshold are never admitted; at 100 TB
    this bound is what keeps the index join from quadratic blowup.
    """
    sh = shingles(df, id_col, text_col, n).persist()
    posting_ok = sh.groupBy("sh").agg(F.count("*").alias("df_")).filter(F.col("df_") <= max_posting)
    pruned = sh.join(posting_ok.select("sh"), "sh", "left_semi")
    cand = (
        pruned.alias("a")
        .join(pruned.alias("b"), "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold)


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — 60-bit SimHash over word tokens.

    Engine path: the shuffle-free array-aggregate formulation
    (:func:`wikipath_spark.functions.text.simhash60`) — per-row integer bit
    votes with JVM array builtins, zero extra rows.  The exploded twin below
    (60 rows per token through the shuffle) is kept as the SQL-oracle mirror;
    a unit test asserts both produce identical fingerprints (the votes are
    exact integer sums, so order of aggregation cannot matter).
    NB: docs with zero word tokens fingerprint to 0 here and are absent from
    the exploded form (explode of an empty array emits nothing).
    """
    return df.select(
        F.col(id_col).alias("id"), simhash60(F.col(text_col)).alias("simhash")
    )


def simhash_fingerprints_exploded(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) via explode + groupBy — per (doc, bit) vote summation.
    The oracle-mirror formulation (60× row blowup; do not use at scale)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)).alias("tok"),
    )
    hashed = toks.select("id", h60(F.col("tok"), 9).alias("h"))
    bits = hashed.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b"), "h"
    ).select(
        "id",
        "b",
        # exact integer bit extraction (shiftright accepts a column in SQL form)
        (F.expr("shiftright(h, cast(b as int))") % 2 * 2 - 1).alias("vote"),
    )
    votes = bits.groupBy("id", "b").agg(F.sum("vote").alias("v"))
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), cast(b as int))")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: banded bucketing (a pair within
    Hamming distance < bands must agree on ≥1 band — pigeonhole), then exact
    ``bit_count(xor)`` verification.  Returns (id_a, id_b, hamming)."""
    fp = simhash_fingerprints(df, id_col, text_col)
    width = 60 // bands
    mask = (1 << width) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            (F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))).alias("key"),
        )
        for b in range(bands)
    ]
    buckets = fp.select("id", "simhash", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    return (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
