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
from gofast_spark.stats.inferential import (
    anova_test,
    chi2_test,
    ks_test_2samp,
    t_test_independent,
    t_test_p_value,
)

__all__ = [
    "t_test_independent",
    "t_test_p_value",
    "anova_test",
    "chi2_test",
    "ks_test_2samp",
    "describe",
    "quartiles",
    "iqr",
    "get_range",
    "hmean",
    "gini_coeff",
    "weighted_median",
    "corr_matrix",
]
