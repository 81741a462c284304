"""Skew correction (SURVEY §2.8).

Reference: ``handle_skew`` (gofast/dataops/quality.py:4372),
``boxcox_transformation`` (gofast/dataops/preprocessing.py:2545).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skewness_profile(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Per-column sample skewness, one row per column."""
    row = df.agg(*[F.skewness(c).alias(c) for c in columns])
    stacked = [
        F.struct(F.lit(c).alias("column"), F.col(c).alias("skewness")) for c in columns
    ]
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


# default Box-Cox lambda search grid (same literals feed the oracle SQL)
BOXCOX_GRID: tuple[float, ...] = tuple(round(-2.0 + 0.2 * i, 1) for i in range(21))


def _bc(col, lam: float):
    """Box-Cox transform expression for a fixed lambda."""
    if lam == 0:
        return F.log(col)
    return (F.pow(col, F.lit(lam)) - 1.0) / F.lit(lam)


def boxcox_lambda(
    df: DataFrame, column: str, *, lambdas: Sequence[float] | None = None
) -> float:
    """Grid-MLE Box-Cox lambda in ONE aggregation pass.

    The profile log-likelihood for each candidate lambda is
    ``-n/2 * ln(var_pop(y_lam)) + (lam - 1) * sum(ln x)`` — every
    ``var_pop`` lands in the same aggregate, so the fit costs one job
    regardless of grid size (SURVEY §4.2.3 two-pass Estimator).  Ties
    break toward the smaller lambda for determinism.  Requires x > 0.
    """
    grid = list(lambdas or BOXCOX_GRID)
    x = F.col(column)
    aggs = [F.count(x).alias("__n"), F.sum(F.log(x)).alias("__slog")]
    aggs += [F.var_pop(_bc(x, lam)).alias(f"__v_{i}") for i, lam in enumerate(grid)]
    row = df.agg(*aggs).first()
    import math

    n, slog = row["__n"], row["__slog"]
    best_lam, best_ll = None, None
    for i, lam in enumerate(grid):
        v = row[f"__v_{i}"]
        if not v or v <= 0:
            continue
        ll = -n / 2.0 * math.log(v) + (lam - 1.0) * slog
        if best_ll is None or ll > best_ll:
            best_lam, best_ll = lam, ll
    return best_lam if best_lam is not None else 0.0


def boxcox_transformation(
    df: DataFrame,
    columns: Sequence[str],
    *,
    lambdas: Sequence[float] | None = None,
) -> DataFrame:
    """Box-Cox with per-column MLE lambda (grid search).

    Reference: ``boxcox_transformation``
    (gofast/dataops/preprocessing.py:2545) — scipy's MLE; here the
    lambda is fitted on the grid via :func:`boxcox_lambda` (one aggregate
    per column), then applied lazily.  Columns must be positive.
    """
    out = df
    for c in columns:
        lam = boxcox_lambda(df, c, lambdas=lambdas)
        out = out.withColumn(c, _bc(F.col(c), lam))
    return out


def handle_skew(
    df: DataFrame,
    columns: Sequence[str],
    *,
    method: str = "log",
) -> DataFrame:
    """Transform skewed columns: log / sqrt / box-cox.

    log and sqrt shift to the positive domain first (the reference shifts
    by ``-min + 1`` for non-positive columns); ``boxcox`` runs the real
    grid-MLE lambda fit (:func:`boxcox_transformation`) after the shift.
    """
    mins = df.agg(*[F.min(c).alias(c) for c in columns]).first()
    out = df
    shifted_cols = []
    for c in columns:
        mn = mins[c] or 0.0
        shift = (-mn + 1.0) if mn <= 0 else 0.0
        col = F.col(c) + F.lit(shift)
        if method == "log":
            out = out.withColumn(c, F.log(col))
        elif method == "sqrt":
            out = out.withColumn(c, F.sqrt(col))
        elif method == "boxcox":
            if shift:
                out = out.withColumn(c, col)
            shifted_cols.append(c)
        else:
            raise ValueError(f"unsupported method {method!r}")
    if shifted_cols:
        out = boxcox_transformation(out, shifted_cols)
    return out
