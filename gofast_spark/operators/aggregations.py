"""Aggregation operators (SURVEY §2.4).

GroupBy/agg in Spark already does partial (map-side) aggregation before the
shuffle, so these wrappers focus on faithfully reproducing the reference's
richer specs: dict agg specs, HAVING, keep-columns, binned statistics.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# agg-spec string -> builder.  Median is exact `percentile` (matches the
# reference's numpy median); at 100 TB switch to percentile_approx via
# the `exact` flag (SURVEY §7.3.7 exactness knob).
_AGG_FNS: dict[str, Callable[[str], Column]] = {
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "avg": lambda c: F.avg(c),
    "count": lambda c: F.count(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "median": lambda c: F.percentile(c, 0.5),
    "median_approx": lambda c: F.percentile_approx(c, 0.5),
    "std": lambda c: F.stddev_samp(c),
    "var": lambda c: F.var_samp(c),
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "nunique": lambda c: F.countDistinct(c),
    "nunique_approx": lambda c: F.approx_count_distinct(c),
}


def _callable_agg(fn: Callable, col: str) -> Column:
    """Wrap an arbitrary Python callable (pandas Series -> scalar) as a
    GROUPED_AGG pandas UDF — the reference's escape hatch for callable
    ``agg_func`` specs (gofast/utils/data_utils.py:1416-1424).

    Slow path by design: Arrow ships each group's column to Python in one
    batch (not per-row).  Prefer the string specs (JVM aggregates) in the
    hot path; this exists so every reference pipeline still runs.
    """
    import pandas as pd

    # the (pd.Series) -> float signature makes pandas_udf infer GROUPED_AGG;
    # set real annotation objects (PEP 563 stringifies inline hints here)
    def _agg(v):
        return float(fn(v))

    _agg.__annotations__ = {"v": pd.Series, "return": float}

    udf = F.pandas_udf(_agg, "double")
    name = getattr(fn, "__name__", "fn")
    name = name if name != "<lambda>" else "lambda"
    return udf(F.col(col)).alias(f"{col}_{name}")


def _build_aggs(agg_spec: dict[str, str | Callable | Sequence]) -> list[Column]:
    """dict(col -> func or [funcs]) -> aliased agg columns (pandas-style
    ``col_func`` names, mirroring group_and_aggregate's output columns).
    Funcs are string names (JVM fast path) or Python callables
    (GROUPED_AGG pandas UDF fallback, §2.13)."""
    aggs: list[Column] = []
    for col, fns in agg_spec.items():
        fns = [fns] if isinstance(fns, str) or callable(fns) else list(fns)
        for fn in fns:
            if callable(fn):
                aggs.append(_callable_agg(fn, col))
            elif fn in _AGG_FNS:
                aggs.append(_AGG_FNS[fn](col).alias(f"{col}_{fn}"))
            else:
                raise ValueError(f"unsupported agg {fn!r}")
    return aggs


def grouped_apply(df: DataFrame, by, fn: Callable, schema: str) -> DataFrame:
    """``applyInPandas`` bridge: run a pandas function per group
    (sklearn-transformer / scipy-per-series escape hatch, SURVEY §2.13,
    §4.2.5).  ``schema`` declares the output so Catalyst can prune around
    the UDF; size-bound your groups — each must fit one worker's memory."""
    keys = [by] if isinstance(by, str) else list(by)
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def group_and_aggregate(
    df: DataFrame,
    by: str | Sequence[str],
    agg_spec: dict[str, str | Sequence[str]],
    *,
    dropna: bool = False,
) -> DataFrame:
    """GROUP BY with a dict agg spec.

    Reference: ``group_and_aggregate`` (gofast/utils/data_utils.py:1379) —
    spec is col -> func-name(s); pandas names outputs ``col_func`` when
    multiple.  ``dropna`` drops NULL group keys first (pandas default
    behavior; Spark keeps a NULL group unless told otherwise).
    """
    keys = [by] if isinstance(by, str) else list(by)
    out = df
    if dropna:
        for k in keys:
            out = out.where(F.col(k).isNotNull())
    return out.groupBy(*keys).agg(*_build_aggs(agg_spec))


def smart_group(
    df: DataFrame,
    by: str | Sequence[str],
    agg_spec: dict[str, str | Sequence[str]],
    *,
    having: dict[str, tuple[str, Any]] | None = None,
    fillna: dict | None = None,
    sort_by: str | Sequence[str] | None = None,
    ascending: bool = False,
) -> DataFrame:
    """GROUP BY + aggs + HAVING + fillna-before + sort.

    Reference: ``smart_group`` (gofast/dataops/transformation.py:663).
    HAVING is a post-aggregation ``where`` on the aliased agg columns
    (``{agg_col: (op, value)}``) — Catalyst evaluates it on the already
    reduced data, exactly like SQL HAVING.
    """
    from gofast_spark.operators.filters import _OPS

    out = df.fillna(fillna) if fillna else df
    out = group_and_aggregate(out, by, agg_spec)
    for col, (op, v) in (having or {}).items():
        out = out.where(_OPS[op](F.col(col), v))
    if sort_by:
        keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        out = out.orderBy(*[F.col(k).asc() if ascending else F.col(k).desc() for k in keys])
    return out


def binning_statistic(
    df: DataFrame,
    category_col: str,
    value_col: str,
    statistic: str = "mean",
) -> DataFrame:
    """Per-category statistic of a value column.

    Reference: ``binning_statistic`` (gofast/utils/base_utils.py:4659) —
    statistic in mean/sum/count/median/min/max.
    """
    if statistic not in _AGG_FNS:
        raise ValueError(f"unsupported statistic {statistic!r}")
    return df.groupBy(category_col).agg(
        _AGG_FNS[statistic](value_col).alias(f"{value_col}_{statistic}")
    )


def category_count(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Value counts per categorical column, stacked long.

    Reference: ``category_count`` (gofast/dataops/management... via
    gofast/utils/base_utils.py:4731).  Output: (column, value, count).
    """
    cols = columns or [c for c, t in df.dtypes if t == "string"]
    parts = [
        df.groupBy(F.lit(c).alias("column"), F.col(c).cast("string").alias("value")).agg(
            F.count(F.lit(1)).alias("count")
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_unique_values(
    df: DataFrame, columns: Sequence[str] | None = None, *, approx: bool = False
) -> DataFrame:
    """Per-column distinct counts and ratios, one output row per column.

    Reference: ``check_unique_values`` (gofast/dataops/quality.py:1568).

    Scale note: exact mode is one aggregate with N ``count(distinct)``s —
    Spark expands it via a single expand+aggregate; ``approx=True`` uses
    HyperLogLog sketches (one pass, no expand) for the 100 TB path.
    """
    cols = columns or df.columns
    fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        fn(F.col(c)).alias(f"__u_{c}") for c in cols
    ]
    row = df.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__u_{c}").cast("bigint").alias("n_unique"),
            (F.col(f"__u_{c}") / F.col("__n")).alias("unique_ratio"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


def cumulative_ops(
    df: DataFrame,
    value_col: str,
    order_by: str | Sequence[str],
    *,
    partition_by: str | Sequence[str] | None = None,
    op: str = "cumsum",
) -> DataFrame:
    """Cumulative sum/product along an explicit ordering.

    Reference: ``cumulative_ops`` (gofast/stats/utils.py:236) — pandas
    cumsum/cumprod from the row index.  Spark has no row index (SURVEY
    §7.3.1), so ``order_by`` is mandatory and ``partition_by`` bounds the
    window state per group.  cumprod is exp(sum(log|v|)) with explicit
    zero tracking (any zero so far -> 0.0) and sign tracking (parity of
    negatives so far); use ``cumsum`` for the exact path.
    """
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if partition_by:
        parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = (
            Window.partitionBy(*parts)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    v = F.col(value_col)
    if op == "cumsum":
        expr = F.sum(v).over(w)
    elif op == "cumprod":
        n_zero = F.sum((v == 0).cast("int")).over(w)
        n_neg = F.sum((v < 0).cast("int")).over(w)
        mag = F.exp(F.sum(F.log(F.abs(v))).over(w))
        sign = F.when(F.pmod(n_neg, F.lit(2)) == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
        expr = F.when(n_zero > 0, F.lit(0.0)).otherwise(mag * sign)
    elif op == "cummax":
        expr = F.max(v).over(w)
    elif op == "cummin":
        expr = F.min(v).over(w)
    else:
        raise ValueError(f"unsupported op {op!r}")
    return df.withColumn(f"{value_col}_{op}", expr)
