"""Data-quality suite (SURVEY §2.8): missing data, duplicates, outliers,
skew, scaling, and the composite audit — each a lazy transform, with
report side-channels computed as aggregations."""

from gofast_spark.quality.missing import drop_nan_in, handle_missing_data, handle_nans, missing_profile, nan_ops
from gofast_spark.quality.duplicates import handle_duplicates, handle_unique_identifiers, has_duplicates
from gofast_spark.quality.outliers import mad_outliers, OutlierHandler, handle_outliers_in
from gofast_spark.quality.scaling import (
    minmax_scale,
    robust_scale,
    robust_scale_grouped,
    standard_scale,
    z_scores,
)
from gofast_spark.quality.skew import boxcox_lambda, boxcox_transformation, handle_skew, skewness_profile
from gofast_spark.quality.audit import audit_data, benford_profile, verify_data_integrity
from gofast_spark.quality.control import data_assistant, quality_control
from gofast_spark.quality.augment import (
    add_noises_to,
    augment_data,
    cleaner,
    drop_correlated_features,
    inspect_data,
    nan_to_na,
    replace_data,
)

__all__ = [
    "handle_missing_data",
    "handle_nans",
    "nan_ops",
    "drop_nan_in",
    "handle_duplicates",
    "has_duplicates",
    "handle_unique_identifiers",
    "handle_outliers_in",
    "OutlierHandler",
    "minmax_scale",
    "robust_scale",
    "robust_scale_grouped",
    "standard_scale",
    "z_scores",
    "handle_skew",
    "audit_data",
    "benford_profile",
    "verify_data_integrity",
    "missing_profile",
    "skewness_profile",
    "boxcox_lambda",
    "boxcox_transformation",
    "replace_data",
    "augment_data",
    "add_noises_to",
    "nan_to_na",
    "cleaner",
    "drop_correlated_features",
    "inspect_data",
    "quality_control",
    "data_assistant",
]
