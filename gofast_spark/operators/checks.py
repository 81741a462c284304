"""Schema/membership checks and positional extraction (SURVEY §2.2, §2.4).

Reference: ``exist_features``/``features_in`` (gofast/core/checks.py:3062,
2548), ``is_in_if``/``is_in`` (:1557, 3563), ``filter_position``
(gofast/utils/spatial_utils.py:1813), ``data_extractor``
(gofast/utils/data_utils.py:4451), ``get_confidence_ratio``
(gofast/core/utils.py:2095), ``compute_coverage``
(gofast/utils/mathext.py:925), ``soft_bin_stat``
(gofast/utils/base_utils.py:4812).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exist_features(
    df: DataFrame, features: Sequence[str], *, error: str = "raise"
) -> bool:
    """Verify the named columns exist (exist_features,
    gofast/core/checks.py:3062).  error='raise' | 'warn' | 'ignore'."""
    missing = [c for c in features if c not in df.columns]
    if missing and error == "raise":
        raise KeyError(f"missing features: {missing}")
    if missing and error == "warn":
        import warnings

        warnings.warn(f"missing features: {missing}", stacklevel=2)
    return not missing


def features_in(
    df: DataFrame, *, include: str | None = None
) -> tuple[list[str], list[str]]:
    """Split columns into (numeric, categorical) lists (features_in,
    gofast/core/checks.py:2548) — schema introspection only, no job."""
    num_types = ("double", "float", "int", "bigint", "smallint", "decimal")
    num = [c for c, t in df.dtypes if t.startswith(num_types)]
    cat = [c for c, t in df.dtypes if not t.startswith(num_types)]
    if include == "numeric":
        return num, []
    if include == "categorical":
        return [], cat
    return num, cat


def is_in_if(
    haystack: Sequence[Any] | DataFrame,
    items: Any | Sequence[Any],
    *,
    error: str = "raise",
    return_diff: bool = False,
):
    """Membership check with error policy (is_in_if,
    gofast/core/checks.py:1557).  ``haystack`` may be a DataFrame (its
    columns) or any sequence."""
    pool = list(haystack.columns) if isinstance(haystack, DataFrame) else list(haystack)
    wanted = [items] if isinstance(items, str) else list(items)
    diff = [x for x in wanted if x not in pool]
    if diff and error == "raise":
        raise ValueError(f"items not found: {diff}")
    if return_diff:
        return diff
    return not diff


def filter_position(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float] | None = None,
    y_range: tuple[float, float] | None = None,
) -> DataFrame:
    """Select rows by coordinate-range predicates (filter_position,
    gofast/utils/spatial_utils.py:1813) — pure pushed-down range filters."""
    out = df
    if x_range is not None:
        out = out.where(F.col(x_col).between(*x_range))
    if y_range is not None:
        out = out.where(F.col(y_col).between(*y_range))
    return out


def data_extractor(
    df: DataFrame,
    *,
    columns: Sequence[str] | None = None,
    conditions: dict[str, Any] | None = None,
) -> DataFrame:
    """Extract a sub-frame by column list + equality/range conditions
    (data_extractor, gofast/utils/data_utils.py:4451).  Condition values:
    scalar (equality), (lo, hi) tuple (inclusive range), or list (isin)."""
    out = df
    for c, v in (conditions or {}).items():
        col = F.col(c)
        if isinstance(v, tuple) and len(v) == 2:
            out = out.where(col.between(*v))
        elif isinstance(v, (list, set)):
            out = out.where(col.isin(list(v)))
        else:
            out = out.where(col == v)
    if columns:
        out = out.select(*columns)
    return out


def get_confidence_ratio(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """Fraction of non-NULL values per column (get_confidence_ratio,
    gofast/core/utils.py:2095) — one aggregation pass, long output
    (column, ratio)."""
    cols = columns or df.columns
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(F.col(c)).alias(f"__c_{c}") for c in cols],
    )
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            (F.col(f"__c_{c}") / F.col("__n")).alias("ratio"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


def compute_coverage(
    df: DataFrame, y_col: str, lower_col: str, upper_col: str
) -> DataFrame:
    """Interval coverage rate: fraction of actuals inside [lower, upper]
    (compute_coverage, gofast/utils/mathext.py:925)."""
    y = F.col(y_col)
    inside = (y >= F.col(lower_col)) & (y <= F.col(upper_col))
    return df.agg(
        F.avg(inside.cast("double")).alias("coverage"),
        F.count(y).alias("n"),
    )


def soft_bin_stat(
    df: DataFrame,
    value_col: str,
    target_col: str,
    *,
    bins: int = 5,
) -> DataFrame:
    """Per-equal-width-bin target rate (soft_bin_stat,
    gofast/utils/base_utils.py:4812): bin the value column, report count
    and mean target per bin — two-pass (min/max fit, then one groupBy)."""
    lo, hi = df.agg(F.min(value_col), F.max(value_col)).first()
    width = ((hi - lo) or 1.0) / bins
    b = F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
    )
    return (
        df.groupBy(b.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col(target_col).cast("double")).alias("target_rate"),
        )
    )


def cube_aggregate(
    df: DataFrame,
    dims: Sequence[str],
    agg_spec: dict[str, str],
    *,
    mode: str = "cube",
    sets: Sequence[Sequence[str]] | None = None,
) -> DataFrame:
    """CUBE / ROLLUP / arbitrary GROUPING SETS aggregations — free Spark
    surface the reference lacks (SURVEY §2.4 'not present': grouping
    sets); exposed because every pandas pivot-table user eventually
    wants subtotals.  ``mode='sets'`` takes the explicit set list in
    ``sets`` (e.g. ``[["a"], ["b"], []]``) — all sets expand map-side
    into one shuffle, same as cube/rollup."""
    from pyspark.sql import functions as F

    from gofast_spark.operators.aggregations import _build_aggs

    if mode == "sets":
        if sets is None:
            raise ValueError("mode='sets' needs the sets list")
        g = df.groupingSets(
            [[F.col(c) for c in s] for s in sets],
            *[F.col(c) for c in dims],
        )
    elif mode == "cube":
        g = df.cube(*dims)
    elif mode == "rollup":
        g = df.rollup(*dims)
    else:
        raise ValueError(f"unknown mode {mode!r} (cube|rollup|sets)")
    return g.agg(*_build_aggs(agg_spec))
