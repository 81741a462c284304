"""Temporal splits and time-series outlier detection.

Reference: ``ts_split`` (gofast/utils/ts_utils.py:3577),
``ts_outlier_detector`` (:3843).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ts_split(
    df: DataFrame,
    dt_col: str,
    *,
    test_frac: float | None = None,
    cutoff=None,
    tiebreak: str | None = None,
    exact: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Time-ordered train/test split (gofast/utils/ts_utils.py:3577).

    - ``cutoff``: explicit timestamp boundary — a pure filter, the 100 TB
      path (partition-prunable on date-partitioned tables).
    - ``test_frac`` + ``exact=True``: exact fractional split via
      ``cume_dist`` over (dt, tiebreak) — engine-portable and
      deterministic, but a global sort; use for bounded data.
    - ``test_frac`` + ``exact=False``: two-pass — ``percentile_approx`` of
      the epoch finds the cutoff (sketch, one pass), then filters; scales
      like the cutoff path.
    """
    d = F.col(dt_col)
    if cutoff is not None:
        return df.where(d <= F.lit(cutoff)), df.where(d > F.lit(cutoff))
    if test_frac is None:
        raise ValueError("give test_frac or cutoff")
    if not exact:
        q = df.agg(
            F.percentile_approx(F.unix_micros(d), 1.0 - test_frac).alias("q")
        ).first()["q"]
        return df.where(F.unix_micros(d) <= q), df.where(F.unix_micros(d) > q)
    order = [d] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.orderBy(*order)
    marked = df.withColumn("__cd", F.cume_dist().over(w))
    train = marked.where(F.col("__cd") <= 1.0 - test_frac).drop("__cd")
    test = marked.where(F.col("__cd") > 1.0 - test_frac).drop("__cd")
    return train, test


def ts_outlier_detector(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    window: int = 7,
    partition_by: str | None = None,
    z_col: str = "rolling_z",
) -> DataFrame:
    """Rolling z-score per point (gofast/utils/ts_utils.py:3843): z =
    (v - rolling_mean) / rolling_std over the trailing ``window`` rows.
    Callers threshold the score (|z| > 3) — kept as a score so the
    decision boundary stays with the user."""
    parts = (
        []
        if partition_by is None
        else ([partition_by] if isinstance(partition_by, str) else list(partition_by))
    )
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(order_by))
        .rowsBetween(-(window - 1), 0)
    )
    v = F.col(value_col)
    mu = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    return df.withColumn(z_col, (v - mu) / sd)
