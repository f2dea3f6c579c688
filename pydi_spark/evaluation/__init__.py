from pydi_spark.evaluation.matching_eval import (
    cluster_consistency_report,
    cluster_size_distribution,
    evaluate_blocking,
    evaluate_matching,
    normalize_labels_expr,
    threshold_sweep,
)

__all__ = [
    "cluster_consistency_report",
    "cluster_size_distribution",
    "evaluate_blocking",
    "evaluate_matching",
    "normalize_labels_expr",
    "threshold_sweep",
]
