from pydi_spark.evaluation.matching_eval import (
    adjusted_rand_index, bcubed_metrics,
    calibration_table,
    cluster_consistency_report,
    cluster_size_distribution,
    evaluate_blocking,
    evaluate_matching,
    normalize_labels_expr,
    threshold_sweep,
)

__all__ = [
    "adjusted_rand_index", "bcubed_metrics",
    "calibration_table",
    "cluster_consistency_report",
    "cluster_size_distribution",
    "evaluate_blocking",
    "evaluate_matching",
    "normalize_labels_expr",
    "threshold_sweep",
]
