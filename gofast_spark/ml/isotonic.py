"""Isotonic (monotone) regression over a binned score axis.

Reference parity: gofast's calibration utilities expose isotonic
calibration alongside Platt scaling (gofast/utils/mathext.py
calibration helpers); sklearn's IsotonicRegression is the canonical
API.  This is the Spark-first reformulation: instead of the sequential
pool-adjacent-violators (PAV) sweep — inherently a serial scan — we
use the minimax identity (Robertson, Wright & Dykstra, *Order
Restricted Statistical Inference*, 1988, eq. 1.9; Barlow et al. 1972)

    iso(k) = max_{i <= k} min_{j >= k} mean(y over blocks i..j)

which is embarrassingly parallel over the (i, j) block grid.  Applied
to a BINNED axis the grid is ``bins**2`` cells regardless of row
count, so the only data-sized stage is one ``bins``-key aggregate:
the 100-TB cost profile is a single map-side-combinable groupBy, and
everything downstream is constant-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["isotonic_fit"]


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    bins: int = 32,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Weighted isotonic regression of ``label_col`` on ``score_col``
    binned into ``bins`` equal-width bins over ``[lo, hi]``.

    Equivalent to PAV on the (bin-mean, bin-count) sequence — the
    classic calibration fit — but computed via the minimax identity so
    no serial scan exists anywhere in the plan:

    1. one data-sized aggregate: per non-empty bin, the row count and
       the exact-integer micro-unit label sum;
    2. prefix sums over the <= ``bins`` present bins (one tiny window);
    3. all contiguous block means ``m(i, j)`` from one inequality
       self-join on the bin frame (``bins**2`` cells; plans as a
       BroadcastNestedLoopJoin on a constant-sized frame);
    4. ``min_{j >= k}`` as a per-``i`` suffix-min window, then
       ``max_{i <= k}`` as one ``bins``-group aggregate.

    Every block mean is a single division of exact integers, so the
    fitted values are bit-identical across engines and partitionings
    (the repo's deterministic-sum discipline).  Scores outside
    ``[lo, hi]`` are excluded (the calibration_curve domain contract).

    Returns one row per non-empty bin:
    ``(bin, n, mean_score, pos_rate, iso)`` with ``iso`` monotone
    non-decreasing in ``bin``.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError("need hi > lo")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    width = (hi - lo) / float(bins)
    b = F.least(
        F.floor((s - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(bins - 1),
    )
    u6: Column = (s * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    yu6: Column = (y * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    base = df.where(
        s.isNotNull() & y.isNotNull() & (s >= lo) & (s <= hi)
    ).select(b.alias("bin"), u6.alias("s_u6"), yu6.alias("y_u6"))

    per_bin = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s_u6").alias("sy_s"),
        F.sum("y_u6").alias("sy"),
    )
    w = Window.orderBy("bin")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    pb = per_bin.select(
        "bin",
        "n",
        "sy_s",
        "sy",
        F.sum("n").over(wc).alias("cn"),
        F.sum("sy").over(wc).alias("cy"),
    )
    a = pb.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn_i"),
        (F.col("cy") - F.col("sy")).alias("cy_i"),
    )
    bfr = pb.select(
        F.col("bin").alias("j"),
        F.col("cn").alias("cn_j"),
        F.col("cy").alias("cy_j"),
    )
    # all contiguous blocks [i..j]: mean = exact-int / exact-int
    blocks = a.join(bfr, F.col("i") <= F.col("j")).select(
        "i",
        "j",
        (
            (F.col("cy_j") - F.col("cy_i"))
            / ((F.col("cn_j") - F.col("cn_i")) * F.lit(1e6))
        ).alias("m"),
    )
    # g(i, k) = min_{j >= k} m(i, j): suffix min per i, read at j = k
    wsuf = (
        Window.partitionBy("i")
        .orderBy(F.col("j").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = blocks.select("i", "j", F.min("m").over(wsuf).alias("gmin"))
    # iso(k) = max_{i <= k} g(i, k); the grid only holds i <= j rows
    iso = g.groupBy(F.col("j").alias("bin")).agg(
        F.max("gmin").alias("iso")
    )
    return (
        per_bin.join(iso, "bin")
        .select(
            "bin",
            "n",
            (F.col("sy_s") / (F.col("n") * F.lit(1e6))).alias("mean_score"),
            (F.col("sy") / (F.col("n") * F.lit(1e6))).alias("pos_rate"),
            "iso",
        )
    )
