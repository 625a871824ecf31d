"""wikipath_spark — a PySpark-native link-graph analytics engine.

A brand-new engine with the query and data-processing capabilities of
ldobbelsteen/wikipath (reference at /root/reference, studied in SURVEY.md),
re-expressed Spark-first: the reference's LMDB adjacency tables become one
distinct `(src, dst)` edge DataFrame, its single-threaded regex extraction
becomes Arrow-batched pandas UDFs, its redirect-chain compression becomes a
pointer-jumping fixpoint, and its bidirectional BFS becomes a driver loop of
DataFrame joins.  On top of wikipath parity the engine adds the iterative
graph kernels the north rule requires (PageRank, connected components, label
propagation, triangle counting) and the training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from wikipath_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
