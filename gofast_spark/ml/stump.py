"""Histogram-based decision-stump split finding, fully in-plan.

The primitive under every distributed gradient-boosted tree
(LightGBM/XGBoost ``hist`` mode; public algorithm: Ke et al., "LightGBM:
A Highly Efficient Gradient Boosting Decision Tree", NeurIPS 2017):
instead of sorting the feature (a full shuffle per split), rows fold
into a FIXED equi-width histogram — one groupBy over <= ``bins`` keys —
and every candidate split is evaluated from the histogram's cumulative
sums.  Finding the best split of 100 TB costs one scan + a 64-row
window, and the result is deterministic because the grid is declared,
not data-dependent (the repo's ``value_histogram`` convention).

Mirrors the reference's tree estimators (``gofast/estimators/tree.py``)
at the single-split level; the split criterion is the Gini impurity
decrease of a binary label.  All arithmetic derives from exact integer
counts in a fixed expression order, so a SQL oracle reproduces the
gains bit-for-bit — no rounding needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_stump(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Best binary split of ``feature_col`` for the 0/1 ``label_col``
    over the declared ``[lo, hi)`` grid: returns ONE row
    ``(threshold, gain, n_left, n_right, pos_left, pos_right)`` where
    rows with ``feature < threshold`` go left.

    One histogram groupBy (map-side combined), one cumulative window
    over the bins-sized frame, one ``max_by`` argmax with the
    (gain DESC, threshold ASC) tie-break — entirely in-plan, no
    collect.  Candidates with an empty side are excluded.  Values
    outside the grid clamp to the edge bins (they can still be split
    off by the outermost thresholds)."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not hi > lo:
        raise ValueError("need hi > lo")
    x = F.col(feature_col).cast("double")
    y = F.col(label_col).cast("bigint")
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)).cast("int"),
                   F.lit(0)),
        F.lit(bins - 1),
    )
    hist = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(y).alias("pos"))
    )
    totals = hist.agg(
        F.sum("n").alias("__n"), F.sum("pos").alias("__pos")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cand = (
        hist.withColumn("n_left", F.coalesce(F.sum("n").over(w), F.lit(0)))
        .withColumn("pos_left", F.coalesce(F.sum("pos").over(w), F.lit(0)))
        .crossJoin(F.broadcast(totals))
        .where((F.col("n_left") > 0) & (F.col("__n") - F.col("n_left") > 0))
    )

    def gini(pos, n):
        p = pos.cast("double") / n.cast("double")
        return 2.0 * p * (1.0 - p)

    n, npos = F.col("__n"), F.col("__pos")
    nl, pl = F.col("n_left"), F.col("pos_left")
    nr, pr = n - nl, npos - pl
    gain = (
        gini(npos, n)
        - (nl.cast("double") / n.cast("double")) * gini(pl, nl)
        - (nr.cast("double") / n.cast("double")) * gini(pr, nr)
    )
    scored = cand.select(
        (F.lit(lo) + F.col("bin").cast("double") * F.lit(width))
        .alias("threshold"),
        gain.alias("gain"),
        nl.alias("n_left"),
        nr.alias("n_right"),
        pl.alias("pos_left"),
        pr.alias("pos_right"),
    )
    pick = F.struct(
        F.col("gain"), (-F.col("threshold")).alias("neg_thr")
    )
    row = F.struct(
        "threshold", "gain", "n_left", "n_right", "pos_left", "pos_right"
    )
    return scored.agg(F.max_by(row, pick).alias("best")).select("best.*")
