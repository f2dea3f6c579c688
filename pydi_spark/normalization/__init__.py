from pydi_spark.normalization.datasets import DatasetNormalizer, apply_column_transforms
from pydi_spark.normalization.detectors import (
    NULL_TOKENS,
    duplicate_stats,
    null_standardize_expr,
    outlier_bounds,
)
from pydi_spark.normalization.canonicalize import (
    apply_canonicalization,
    canonicalize_values,
)
from pydi_spark.normalization.impute import impute_missing
from pydi_spark.normalization.robust import (
    clip_outliers,
    collapse_rare_categories,
    encode_categories,
    k_anonymity_report,
    mask_columns,
    value_cluster_report,
)
from pydi_spark.normalization.repair import fd_repair_report, repair_fd_violations
from pydi_spark.normalization.transforms import BUILTIN_TRANSFORMS, transform_expr
from pydi_spark.normalization.typedetect import detect_column_types, type_match_rates
from pydi_spark.normalization.units import (
    UNITS_TABLE,
    convert_units,
    convert_units_expr,
    normalize_header_units,
    normalize_units,
    normalize_units_expr,
    parse_quantity_expr,
)
from pydi_spark.normalization.validators import DataQualityChecker

__all__ = [
    "BUILTIN_TRANSFORMS",
    "DataQualityChecker",
    "DatasetNormalizer",
    "NULL_TOKENS",
    "UNITS_TABLE",
    "apply_column_transforms",
    "convert_units",
    "convert_units_expr",
    "detect_column_types",
    "duplicate_stats",
    "normalize_header_units",
    "normalize_units",
    "normalize_units_expr",
    "null_standardize_expr",
    "outlier_bounds",
    "fd_repair_report",
    "apply_canonicalization",
    "canonicalize_values",
    "clip_outliers",
    "collapse_rare_categories",
    "encode_categories", "k_anonymity_report", "mask_columns",
    "value_cluster_report",
    "impute_missing",
    "repair_fd_violations",
    "parse_quantity_expr",
    "transform_expr",
    "type_match_rates",
]
