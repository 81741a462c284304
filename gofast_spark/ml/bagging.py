"""Bagged decision stumps — one scan, all replicates.

Public algorithm: Breiman, "Bagging Predictors" (Machine Learning 24,
1996), over the histogram split primitive of ml/stump.py (Ke et al.,
NeurIPS 2017 `hist` mode).  Mirrors the reference's ensemble surface
(``gofast/ensemble.py``, ``gofast/estimators/ensemble.py``) at the
bagged-stump level.

Each replicate resamples rows with portable Poisson(1) weights — the
repo's bootstrap convention (stats/resampling.py): the weight is an
inverse-CDF draw from the md5 hash of (key, replicate, seed), so DuckDB
reproduces every resample exactly.  Because the weights are exact
integers, each replicate's weighted histogram — and hence its best
split and gain — stays exact-integer-derived and SQL-replayable with no
rounding.

Scale shape: ONE scan of the raw data.  The replicate explode amplifies
map-side work ``n_estimators`` times, but the map-side combine folds
everything into a (replicates x bins)-key histogram, so the shuffle is
ensemble-sized, not data-sized; all downstream windows run per
replicate over <= ``bins`` rows.  Fitting 32 bagged stumps on 100 TB
costs one pass and a kilobyte-scale shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fit_bagged_stumps(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    key_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 64,
    n_estimators: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Fit ``n_estimators`` Poisson-bootstrap stump replicates in one
    scan: returns one row per replicate ``(replicate, threshold, gain,
    n_left, n_right, pos_left, pos_right)`` where counts are the exact
    integer resample weights.  Rows with ``feature < threshold`` go
    left; ties break (gain DESC, threshold ASC) as in fit_stump."""
    from gofast_spark.stats.resampling import (
        _poisson1_weight,
        _portable_uniform_int,
    )

    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not hi > lo:
        raise ValueError("need hi > lo")
    if n_estimators < 1:
        raise ValueError("n_estimators must be >= 1")
    x = F.col(feature_col).cast("double")
    y = F.col(label_col).cast("bigint")
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)).cast("int"),
                   F.lit(0)),
        F.lit(bins - 1),
    )
    rep = df.where(x.isNotNull() & y.isNotNull()).withColumn(
        "replicate",
        F.explode(F.array([F.lit(i) for i in range(n_estimators)])),
    )
    w = _poisson1_weight(_portable_uniform_int(key_col, seed)).cast("bigint")
    hist = rep.groupBy(F.col("replicate"), b.alias("bin")).agg(
        F.sum(w).alias("n"), F.sum(w * y).alias("pos")
    )
    w_prev = (
        Window.partitionBy("replicate")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("replicate")
    cand = (
        hist.withColumn(
            "n_left", F.coalesce(F.sum("n").over(w_prev), F.lit(0))
        )
        .withColumn(
            "pos_left", F.coalesce(F.sum("pos").over(w_prev), F.lit(0))
        )
        .withColumn("__n", F.sum("n").over(w_tot))
        .withColumn("__pos", F.sum("pos").over(w_tot))
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
        "replicate",
        (F.lit(lo) + F.col("bin").cast("double") * F.lit(width))
        .alias("threshold"),
        gain.alias("gain"),
        nl.alias("n_left"),
        nr.alias("n_right"),
        pl.alias("pos_left"),
        pr.alias("pos_right"),
    )
    pick = F.struct(F.col("gain"), (-F.col("threshold")).alias("neg_thr"))
    row = F.struct(
        "threshold", "gain", "n_left", "n_right", "pos_left", "pos_right"
    )
    return (
        scored.groupBy("replicate")
        .agg(F.max_by(row, pick).alias("best"))
        .select("replicate", "best.*")
    )
