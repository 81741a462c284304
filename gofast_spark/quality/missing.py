"""Missing-data operators (SURVEY §2.8).

NaN-vs-NULL policy (SURVEY §7.3.2): the reference conflates them (pandas);
here every op treats **both** as missing by default — predicates use
``isNull() | isnan()`` on float columns — with ``nan_as_null=False`` to
opt out.  Imputation statistics come from one aggregation pass (the MLlib
Estimator pattern); the transform itself stays lazy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FLOATY = ("double", "float")


def _is_missing(df: DataFrame, col: str, nan_as_null: bool = True) -> Column:
    c = F.col(col)
    if nan_as_null and dict(df.dtypes).get(col) in _FLOATY:
        return c.isNull() | F.isnan(c)
    return c.isNull()


def missing_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """% missing per column, one row per column.

    Reference: ``Missing.isnull`` (gofast/dataops/core.py:911-916) and
    ``check_missing_data`` (gofast/dataops/quality.py:1127).  Single
    aggregation pass over all columns.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(_is_missing(df, c).cast("bigint")).alias(f"__m_{c}") for c in cols
    ]
    row = df.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__m_{c}").cast("bigint").alias("n_missing"),
            (F.col(f"__m_{c}") / F.col("__n")).alias("missing_ratio"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


def handle_missing_data(
    df: DataFrame,
    method: str,
    *,
    columns: Sequence[str] | None = None,
    fill_value=None,
    threshold: float = 0.5,
    order_by: str | Sequence[str] | None = None,
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Drop/fill missing data.

    Reference: ``handle_missing_data`` (gofast/dataops/quality.py:728) —
    methods: ``drop_rows``, ``drop_cols`` (columns whose missing ratio
    exceeds ``threshold``), ``fill_mean``, ``fill_median``, ``fill_value``,
    ``ffill``/``bfill`` (require ``order_by``; SURVEY §4.2.2).

    Scale notes: ``fill_mean`` is one agg pass + a projection;
    ``fill_median`` uses exact ``percentile`` (switch to
    ``percentile_approx`` at cluster scale); ``drop_cols`` must materialize
    the ratio aggregate (driver decision on schema) — unavoidable, but it
    is a single reduced row.
    """
    cols = columns or [c for c, t in df.dtypes if t in ("double", "float", "int", "bigint")]
    if method == "drop_rows":
        cond = None
        for c in cols:
            m = _is_missing(df, c)
            cond = m if cond is None else (cond | m)
        return df.where(~cond)
    if method == "drop_cols":
        ratios = (
            df.agg(
                *[F.avg(_is_missing(df, c).cast("int")).alias(c) for c in cols]
            ).first()
        )
        drop = [c for c in cols if (ratios[c] or 0.0) > threshold]
        return df.drop(*drop)
    if method == "fill_value":
        return df.fillna(fill_value, subset=list(cols))
    if method in ("fill_mean", "fill_median", "fill_mode"):
        if method == "fill_mode":
            # mode per column (ties -> smallest value, deterministic);
            # F.mode is a single aggregate — one pass for all columns
            stats = df.agg(
                *[F.mode(F.col(c), False).alias(c) for c in cols]
            ).first()
        else:
            fn = (
                (lambda c: F.avg(c))
                if method == "fill_mean"
                else (lambda c: F.percentile(c, 0.5))
            )
            stats = df.agg(*[fn(F.col(c)).alias(c) for c in cols]).first()
        out = df
        for c in cols:
            if stats[c] is not None:
                out = out.withColumn(
                    c, F.when(_is_missing(out, c), F.lit(stats[c])).otherwise(F.col(c))
                )
        return out
    if method in ("ffill", "bfill"):
        if order_by is None:
            raise ValueError(f"{method} requires order_by (no row index in Spark)")
        from gofast_spark.operators.windows import fill_forward

        out = df
        for c in cols:
            out = fill_forward(
                out, c, order_by=order_by, partition_by=partition_by, direction=method
            )
        return out
    raise ValueError(f"unsupported method {method!r}")


def nan_ops(
    df: DataFrame,
    ops: str = "check",
    *,
    columns: Sequence[str] | None = None,
    fill_value=0,
) -> DataFrame:
    """Check / sanitize / fill NaN with policies.

    Reference: ``nan_ops`` (gofast/utils/data_utils.py:1621).
    ``check`` -> missing profile; ``sanitize`` -> drop fully-missing rows;
    ``fill`` -> constant fill.
    """
    if ops == "check":
        return missing_profile(df, columns)
    if ops == "sanitize":
        cols = columns or df.columns
        cond = None
        for c in cols:
            m = _is_missing(df, c)
            cond = m if cond is None else (cond & m)
        return df.where(~cond)
    if ops == "fill":
        return df.fillna(fill_value, subset=list(columns) if columns else None)
    raise ValueError(f"unsupported ops {ops!r}")


def drop_nan_in(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Drop rows with missing values in any of ``columns``.

    Reference: ``drop_nan_in`` (gofast/core/array_manager.py:3311).
    """
    cond = None
    for c in columns:
        m = _is_missing(df, c)
        cond = m if cond is None else (cond | m)
    return df.where(~cond)


def handle_nans(
    df: DataFrame,
    method: str = "drop_rows",
    **kwargs,
) -> DataFrame:
    """Alias of :func:`handle_missing_data` under the reference's other
    public name (``handle_nans``, gofast/utils/base_utils.py — same
    method vocabulary, NaN and NULL treated uniformly)."""
    return handle_missing_data(df, method, **kwargs)
