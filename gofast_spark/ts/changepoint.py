"""Single-changepoint detection by least-squares segmentation.

Binary segmentation's core step (Scott & Knott 1974; the AMOC — "at
most one change" — form of Hinkley 1970): the best split index of an
ordered series is the one maximizing the between-segment sum-of-squares
gain

    G(t) = S_L^2 / n_L + S_R^2 / n_R - S^2 / n

(equivalently: the split minimizing the two-segment SSE for a
piecewise-constant mean fit).  Recursing on the segments gives full
binary segmentation; one level is the detector a monitoring pipeline
runs per series per day.

Scale shape: the series is an AGGREGATED frame (daily/hourly rollup —
small by construction, the repo's ts convention), so one cumulative
window over it + one in-plan ``max_by`` argmax finds the split without
any driver loop; the raw event stream is touched only by the rollup.
All candidate gains derive from the same cumulative sums in one fixed
expression order, ties break on the earliest time."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_changepoint(
    df: DataFrame,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """One row: ``(change_at, gain, n_left, n_right, mean_left,
    mean_right)`` — the first timestamp of the RIGHT segment at the
    best split of the ordered series; rows with null time/value are
    excluded.  Raises nothing on degenerate input: a series with < 2
    points returns an empty frame (no split exists)."""
    t = F.col(time_col)
    y = F.col(value_col).cast("double")
    d = df.where(t.isNotNull() & y.isNotNull()).select(
        t.alias("__t"), y.alias("__y")
    )
    w = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    cum = d.select(
        "__t",
        F.coalesce(F.sum("__y").over(w), F.lit(0.0)).alias("__sl"),
        F.coalesce(F.count("__y").over(w), F.lit(0)).alias("__nl"),
    )
    tot = d.agg(
        F.sum("__y").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    nl = F.col("__nl").cast("double")
    nr = (F.col("__n") - F.col("__nl")).cast("double")
    sl = F.col("__sl")
    sr = F.col("__s") - sl
    gain = (
        sl * sl / nl + sr * sr / nr
        - F.col("__s") * F.col("__s") / F.col("__n").cast("double")
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .where((F.col("__nl") > 0) & (F.col("__n") - F.col("__nl") > 0))
        .select(
            F.col("__t").alias("change_at"),
            gain.alias("gain"),
            F.col("__nl").alias("n_left"),
            (F.col("__n") - F.col("__nl")).alias("n_right"),
            (sl / nl).alias("mean_left"),
            (sr / nr).alias("mean_right"),
        )
    )
    # argmax on (gain, -epoch): equal gains pick the EARLIEST split
    row = F.struct(
        "change_at", "gain", "n_left", "n_right", "mean_left", "mean_right"
    )
    ordkey = F.struct(
        F.col("gain"),
        (-F.unix_micros(F.col("change_at").cast("timestamp"))).alias("nt"),
    )
    return cand.agg(F.max_by(row, ordkey).alias("b")).select("b.*")
