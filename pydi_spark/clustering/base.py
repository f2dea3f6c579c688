"""Post-clustering base: refine a CorrespondenceSet.

Reference: BasePostClusterer(threshold, min_cluster_size,
preserve_scores).cluster(correspondences) (PyDI/entitymatching/
post_clustering/base.py:17-101; threshold pre-filter :106-132).

Two execution regimes, chosen per algorithm exactly like the survey's
scale analysis (§2.5):
- *Distributed*: connected components (iterative join-loop), stable
  matching (two rank-1 windows + join) — correspondence sets can be huge.
- *Driver-side*: greedy 1:1, hungarian/bipartite, hierarchical, centre —
  inherently sequential global-state algorithms; correspondences are
  output-sized (much smaller than the record corpus), so collecting them
  matches the reference's semantics honestly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_threshold(corr: DataFrame, threshold: float | None) -> DataFrame:
    if threshold is None:
        return corr
    return corr.where(F.col("score") >= F.lit(float(threshold)))


def filter_min_cluster_size(
    assignments: DataFrame, min_cluster_size: int | None
) -> DataFrame:
    """assignments[record_id, cluster_id] -> drop small clusters."""
    if not min_cluster_size or min_cluster_size <= 1:
        return assignments
    sizes = assignments.groupBy("cluster_id").agg(F.count("*").alias("__n"))
    return (
        assignments.join(sizes, "cluster_id")
        .where(F.col("__n") >= min_cluster_size)
        .drop("__n")
    )
