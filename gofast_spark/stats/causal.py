"""Inverse-propensity-weighted treatment-effect estimation.

Public basis: Horvitz & Thompson (JASA 1952) weighting; the
self-normalized (Hajek 1971) ATE estimator

    ATE = sum(t*y/p) / sum(t/p)  -  sum((1-t)*y/(1-p)) / sum((1-t)/(1-p))

with propensities p = P(t=1 | x) from the repo's Newton/IRLS logistic
fit (ml/regression.py fit_logistic_regression) and overlap clipping to
``[eps, 1-eps]`` (Crump et al., Biometrika 2009 common-support
practice).

Spark shape: the propensity fit is one moment aggregate per Newton
iteration (driver-side (p+1)-dim solve between jobs, the
logistic_newton_orders discipline), then the ATE readout is ONE more
aggregate over a pure projection — nothing data-sized ever leaves the
executors, and no per-row Python runs anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.ml.regression import fit_logistic_regression

__all__ = ["ipw_ate"]


def ipw_ate(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    covariate_cols: Sequence[str],
    *,
    n_iter: int = 3,
    eps: float = 0.01,
    solver: str = "cramer",
    coef_round: "int | None" = None,
) -> DataFrame:
    """Hajek-normalized IPW average treatment effect.

    ``treatment_col`` must be 0/1; ``covariate_cols`` feed the logistic
    propensity model (intercept always included; with ``solver=
    'cramer'`` at most two covariates, keeping the whole Newton
    trajectory SQL-replayable).  Returns ONE row: ``(ate,
    mean_treated, mean_control, n_treated, n_control, n)`` where the
    means are the self-normalized weighted outcome means of each arm.
    """
    if not 0.0 < eps < 0.5:
        raise ValueError("eps must be in (0, 0.5)")
    cols = [treatment_col, outcome_col, *covariate_cols]
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    d = df.where(cond)
    m = fit_logistic_regression(
        d, list(covariate_cols), treatment_col, n_iter=n_iter, solver=solver
    )
    w = m["coef"]
    if coef_round is not None:
        # pin the scored weights to a fixed decimal grid so an
        # independent replay of the Newton trajectory (e.g. a SQL
        # oracle) scores the IDENTICAL propensities
        w = [round(wi, int(coef_round)) for wi in w]
    z = F.lit(float(w[0]))
    for wi, c in zip(w[1:], covariate_cols):
        z = z + F.lit(float(wi)) * F.col(c).cast("double")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    p = F.greatest(F.least(p, F.lit(1.0 - eps)), F.lit(eps))
    t = F.col(treatment_col).cast("double")
    y = F.col(outcome_col).cast("double")
    out = d.agg(
        F.sum(t * y / p).alias("swty"),
        F.sum(t / p).alias("swt"),
        F.sum((F.lit(1.0) - t) * y / (F.lit(1.0) - p)).alias("swcy"),
        F.sum((F.lit(1.0) - t) / (F.lit(1.0) - p)).alias("swc"),
        F.sum(t).cast("bigint").alias("n_treated"),
        F.count(F.lit(1)).alias("n"),
    )
    mt = F.col("swty") / F.col("swt")
    mc = F.col("swcy") / F.col("swc")
    return out.select(
        (mt - mc).alias("ate"),
        mt.alias("mean_treated"),
        mc.alias("mean_control"),
        F.col("n_treated"),
        (F.col("n") - F.col("n_treated")).alias("n_control"),
        F.col("n"),
    )
