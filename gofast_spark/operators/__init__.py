"""Relational operator core (SURVEY §2.2–2.7)."""

from gofast_spark.operators.filters import (
    filter_by_isin,
    filter_by_period,
    filter_df,
    group_and_filter,
    mask_by_reference,
    pop_labels_in,
    select_features,
)
from gofast_spark.operators.joins import (
    merge_datasets,
    merge_frames,
    nearest_join,
    pair_data,
)
from gofast_spark.operators.aggregations import (
    binning_statistic,
    category_count,
    check_unique_values,
    cumulative_ops,
    group_and_aggregate,
    smart_group,
)
from gofast_spark.operators.windows import (
    create_lag_features,
    differencing,
    fill_forward,
    moving_average,
    rank_data,
)
from gofast_spark.operators.reshape import (
    compare_frames,
    concat_frames,
    find_intersection,
    find_unique_elements,
    to_long,
    to_wide,
)
from gofast_spark.operators.sampling import (
    random_sampling,
    split_train_test_by_id,
)

__all__ = [
    "filter_df",
    "group_and_filter",
    "filter_by_isin",
    "mask_by_reference",
    "filter_by_period",
    "pop_labels_in",
    "select_features",
    "merge_frames",
    "merge_datasets",
    "pair_data",
    "nearest_join",
    "group_and_aggregate",
    "smart_group",
    "binning_statistic",
    "category_count",
    "check_unique_values",
    "cumulative_ops",
    "create_lag_features",
    "moving_average",
    "differencing",
    "rank_data",
    "fill_forward",
    "to_wide",
    "to_long",
    "concat_frames",
    "compare_frames",
    "find_intersection",
    "find_unique_elements",
    "random_sampling",
    "split_train_test_by_id",
]
