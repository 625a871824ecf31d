from wikipath_spark.operators._loop import checkpoint_tracked, release_checkpoint
from wikipath_spark.operators.bfs import (
    Paths,
    bfs_distances,
    enumerate_paths,
    shortest_paths,
    shortest_paths_driver,
)
from wikipath_spark.operators.components import connected_components
from wikipath_spark.operators.compress import compress_redirects, resolve_through
from wikipath_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from wikipath_spark.operators.kcore import coreness, k_core
from wikipath_spark.operators.labelprop import label_propagation
from wikipath_spark.operators.pagerank import (
    pagerank,
    pagerank_fixedpoint,
    pagerank_multi,
    pagerank_multi_fixedpoint,
    pagerank_numpy_oracle,
)
from wikipath_spark.operators.similarity import (
    add_lsh_bucket,
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from wikipath_spark.operators.skew import degree_histogram, pick_salt, salted_sum
from wikipath_spark.operators.triangles import triangle_count, triangles_per_vertex

__all__ = [
    "Paths",
    "bfs_distances",
    "enumerate_paths",
    "shortest_paths",
    "shortest_paths_driver",
    "checkpoint_tracked",
    "release_checkpoint",
    "connected_components",
    "compress_redirects",
    "resolve_through",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "coreness",
    "k_core",
    "label_propagation",
    "pagerank",
    "pagerank_fixedpoint",
    "pagerank_multi",
    "pagerank_multi_fixedpoint",
    "pagerank_numpy_oracle",
    "add_lsh_bucket",
    "cosine_topk",
    "cosine_topk_lsh",
    "embedding_near_dup_pairs",
    "degree_histogram",
    "pick_salt",
    "salted_sum",
    "triangle_count",
    "triangles_per_vertex",
]
