"""Distribution-drift monitoring: PSI and smoothed KL over fixed bins.

The production-ML monitoring staple (the reference keeps drift checks
in its mlops layer, gofast/mlops/ — out of engine scope there, an
aggregation here): compare a feature's distribution between a
reference sample and a current sample over a DECLARED equi-width grid
and report the Population Stability Index

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

(the symmetrized KL between the binned distributions; credit-risk
folklore thresholds: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted)
plus each side's bin shares.  Laplace smoothing keeps empty bins
finite.

Scale shape: one projection + one bins-sized groupBy per side (map
-side combined), a 1-row broadcast of the totals, and the PSI is one
aggregate of the bins frame.  The declared [lo, hi) grid (the
``value_histogram`` convention) makes results deterministic and the
two sides directly comparable — no data-dependent quantile cuts to
drift on their own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(col: Column, lo: float, width: float, bins: int) -> Column:
    return F.least(
        F.greatest(
            F.floor((col - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(bins - 1),
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """One row: ``(psi, n_ref, n_cur)`` for ``col`` between the two
    frames over the declared grid; out-of-range values clamp to the
    edge bins (they still count — a mass shift past the grid edge is
    drift, not data to ignore)."""
    if bins < 2 or not hi > lo:
        raise ValueError("need bins >= 2 and hi > lo")
    width = (hi - lo) / bins
    s = float(smooth)

    def side(df: DataFrame, name: str) -> DataFrame:
        x = F.col(col).cast("double")
        return (
            df.where(x.isNotNull())
            .groupBy(_bin(x, lo, width, bins).alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"n_{name}"))
        )
    a = side(ref, "ref")
    b = side(cur, "cur")
    grid = ref.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        grid.join(a, "bin", "left")
        .join(b, "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_ref") + F.lit(s)) / (F.col("__tr") + F.lit(s) * bins)
    q = (F.col("n_cur") + F.lit(s)) / (F.col("__tc") + F.lit(s) * bins)
    return (
        joined.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((p - q) * F.log(p / q)).alias("psi"),
            F.max("__tr").alias("n_ref"),
            F.max("__tc").alias("n_cur"),
        )
    )


def psi_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    *,
    bins: int,
    smooth: float = 0.5,
) -> DataFrame:
    """PSI from two pre-aggregated ``(bin, n)`` frames (e.g. a drained
    streaming histogram state vs a stored reference histogram) — the
    monitoring fast path: no raw rows touched, input is 2 x ``bins``
    counters.  Missing bins count as 0; same smoothing/grid contract
    as :func:`psi_report`."""
    s = float(smooth)
    spark = ref_counts.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        grid.join(
            ref_counts.select("bin", F.col("n").alias("n_ref")), "bin",
            "left",
        )
        .join(
            cur_counts.select("bin", F.col("n").alias("n_cur")), "bin",
            "left",
        )
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_ref") + F.lit(s)) / (F.col("__tr") + F.lit(s) * bins)
    q = (F.col("n_cur") + F.lit(s)) / (F.col("__tc") + F.lit(s) * bins)
    return (
        joined.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((p - q) * F.log(p / q)).alias("psi"),
            F.max("__tr").alias("n_ref"),
            F.max("__tc").alias("n_cur"),
        )
    )
