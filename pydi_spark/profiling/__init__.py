from pydi_spark.profiling.dependencies import (
    discover_fds,
    discover_inds,
    discover_keys,
)
from pydi_spark.profiling.profiler import (
    DataProfiler,
    categorical_dispersion,
    correlation_matrix,
    detect_anomalies,
    exact_quantiles,
    find_sequence_gaps,
    grouped_lower_median,
    join_cardinality_report,
    key_skew_report,
    null_pattern_report,
)
from pydi_spark.profiling.sketches import (
    cms_estimate,
    count_min_sketch,
    heavy_hitters_sketch,
    hll_distinct,
    kll_quantiles,
    merge_cms_sketches,
    merge_hll_sketches,
)

__all__ = [
    "DataProfiler",
    "categorical_dispersion",
    "correlation_matrix",
    "discover_fds",
    "detect_anomalies",
    "exact_quantiles",
    "grouped_lower_median",
    "find_sequence_gaps",
    "join_cardinality_report",
    "null_pattern_report",
    "discover_inds",
    "discover_keys",
    "key_skew_report",
    "cms_estimate",
    "count_min_sketch",
    "heavy_hitters_sketch",
    "hll_distinct",
    "kll_quantiles",
    "merge_cms_sketches",
    "merge_hll_sketches",
]
