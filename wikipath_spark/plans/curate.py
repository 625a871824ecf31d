"""Corpus curation — the composed training-data pipeline the individual
operators exist for: language gate → quality gate → exact dedup → near-dup
pruning, in one declarative plan.

Pruning contract (deterministic, embarrassingly parallel): a document is
dropped iff (a) it fails the language/quality gates, (b) an identical text
exists with a smaller id (exact dedup keeps the minimum id), or (c) some
SMALLER-id survivor of (a)+(b) is a near-duplicate (n-gram Jaccard ≥ the
threshold).  Rule (c) is the standard one-pass approximation of greedy
near-dup removal — independent per document, so it parallelizes, at the
cost of occasionally dropping both ends of a chain a sequential greedy
would keep.  Every rule is expressible in ANSI SQL, so the whole pipeline
has a DuckDB oracle twin (__spark_entry__.oracle_sql()["curated_corpus"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikipath_spark.functions.text import lang_id, quality_score
from wikipath_spark.operators.dedup import _fan_out, ngram_jaccard_pairs


def curate_corpus(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.8,
    ngram: int = 4,
) -> DataFrame:
    """Returns the curated ``(doc_id, lang_guess, quality)`` rows.

    Near-dup pruning runs on the gated+deduped survivors only (pairs among
    dropped docs are irrelevant), through the exact prefix-filtered
    all-pairs Jaccard — bucketed candidate generation, never a cross join.
    """
    # fan out first: the language-ID gate runs four regexp counters per row,
    # and a small parquet arrives as one split (single-core otherwise)
    gated = (
        _fan_out(documents).select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            lang_id(F.col(text_col)).alias("lang_guess"),
            quality_score(F.col(text_col)).alias("quality"),
        )
        .filter(F.col("lang_guess").isin(*languages))
        .filter(F.col("quality") >= min_quality)
    )
    # exact dedup: keep the minimum id per identical text
    keeper = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    # eager localCheckpoint (GC-reclaimed), not persist(): scanned by the
    # near-dup pair generation AND the final anti-join; a bare persist()
    # would leak cache across repeated calls in a long-lived session
    unique = gated.join(keeper, ["text", "doc_id"], "left_semi").localCheckpoint(eager=True)

    # near-dup pruning: drop the LARGER id of every qualifying pair
    pairs = ngram_jaccard_pairs(
        unique, id_col="doc_id", text_col="text", n=ngram, threshold=near_dup_threshold
    )
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        unique.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "lang_guess", "quality")
    )
