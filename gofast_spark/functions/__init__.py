"""Scalar function families (SURVEY §2.9): string case/clean, string
analysis, date/time feature extraction, binning, categorical encoding.

Everything here is a thin, composable layer over built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; the two-pass
operators (equal-range binning, label/freq encoding) follow the MLlib
Estimator pattern (tiny stats pass -> broadcast transform).
"""

from gofast_spark.functions.dates import convert_date_features, cyclical_encode
from gofast_spark.functions.encoding import (
    freq_encode,
    label_encode,
    one_hot_encode,
    to_categories,
)
from gofast_spark.functions.sketches import (
    distinct_rollup,
    distinct_sketch,
    histogram_quantile,
    histogram_rollup,
    sketch_rollup_estimate,
    value_histogram,
)
from gofast_spark.functions.cms import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)
from gofast_spark.functions.strings import (
    anonymize_text,
    capitalize_first,
    levenshtein_distance,
    slugify,
    to_camel_case,
    to_snake_case,
    to_title_case,
    truncate_text,
)

__all__ = [
    "to_title_case",
    "to_camel_case",
    "to_snake_case",
    "slugify",
    "capitalize_first",
    "truncate_text",
    "levenshtein_distance",
    "anonymize_text",
    "convert_date_features",
    "cyclical_encode",
    "to_categories",
    "freq_encode",
    "label_encode",
    "one_hot_encode",
    "distinct_sketch",
    "sketch_rollup_estimate",
    "value_histogram",
    "histogram_rollup",
    "histogram_quantile",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "cms_heavy_hitters",
    "distinct_rollup",
]
