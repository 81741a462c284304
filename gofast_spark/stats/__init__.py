"""Statistics (SURVEY §2.10): descriptive natively; inferential via
sufficient statistics + scipy on the driver."""

from gofast_spark.stats.descriptive import (
    corr_matrix,
    describe,
    gini_coeff,
    get_range,
    hmean,
    iqr,
    quartiles,
    weighted_median,
)

__all__ = [
    "describe",
    "quartiles",
    "iqr",
    "get_range",
    "hmean",
    "gini_coeff",
    "weighted_median",
    "corr_matrix",
]
