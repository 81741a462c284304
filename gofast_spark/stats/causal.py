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


def aipw_ate(
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
    """Doubly-robust AIPW average treatment effect (Robins, Rotnitzky
    & Zhao, JASA 1994; the augmented estimator

        ATE = mean[ m1(x) - m0(x) + t (y - m1) / p - (1-t)(y - m0)/(1-p) ]

    is consistent if EITHER the propensity model or the per-arm
    outcome model is right).  The propensity is the same Newton
    logistic as :func:`ipw_ate`; the outcome models are closed-form
    per-arm simple OLS fits — both arms' moments come from ONE
    treatment-weighted aggregate, so the full estimator costs
    ``n_iter + 2`` Spark jobs total, each reducing to one row.

    Restricted to a single covariate (closed-form 2x2 OLS per arm, the
    SQL-replayable envelope).  ``coef_round`` pins the scored
    propensity AND outcome coefficients to a decimal grid for
    cross-engine replay.  Returns ONE row ``(ate_aipw, n_treated,
    n_control, n)``.
    """
    if len(covariate_cols) != 1:
        raise ValueError("aipw_ate supports exactly one covariate")
    xc = covariate_cols[0]
    cond = (
        F.col(treatment_col).isNotNull()
        & F.col(outcome_col).isNotNull()
        & F.col(xc).isNotNull()
    )
    d = df.where(cond)
    m = fit_logistic_regression(
        d, [xc], treatment_col, n_iter=n_iter, solver=solver
    )
    w = m["coef"]
    t = F.col(treatment_col).cast("double")
    y = F.col(outcome_col).cast("double")
    x = F.col(xc).cast("double")
    u = F.lit(1.0) - t
    row = d.agg(
        F.sum(t).alias("n1"),
        F.sum(t * x).alias("sx1"),
        F.sum(t * y).alias("sy1"),
        F.sum(t * x * x).alias("sxx1"),
        F.sum(t * x * y).alias("sxy1"),
        F.sum(u).alias("n0"),
        F.sum(u * x).alias("sx0"),
        F.sum(u * y).alias("sy0"),
        F.sum(u * x * x).alias("sxx0"),
        F.sum(u * x * y).alias("sxy0"),
    ).first()

    def ols(nn, sx, sy, sxx, sxy):
        det = nn * sxx - sx * sx
        return (sy * sxx - sx * sxy) / det, (nn * sxy - sy * sx) / det

    c1, b1 = ols(row["n1"], row["sx1"], row["sy1"], row["sxx1"], row["sxy1"])
    c0, b0 = ols(row["n0"], row["sx0"], row["sy0"], row["sxx0"], row["sxy0"])
    if coef_round is not None:
        r = int(coef_round)
        w = [round(wi, r) for wi in w]
        c1, b1, c0, b0 = (round(v, r) for v in (c1, b1, c0, b0))
    z = F.lit(float(w[0])) + F.lit(float(w[1])) * x
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    p = F.greatest(F.least(p, F.lit(1.0 - eps)), F.lit(eps))
    m1 = F.lit(float(c1)) + F.lit(float(b1)) * x
    m0 = F.lit(float(c0)) + F.lit(float(b0)) * x
    term = (
        m1
        - m0
        + t * (y - m1) / p
        - (F.lit(1.0) - t) * (y - m0) / (F.lit(1.0) - p)
    )
    out = d.agg(
        F.sum(term).alias("ssum"),
        F.sum(t).cast("bigint").alias("n_treated"),
        F.count(F.lit(1)).alias("n"),
    )
    return out.select(
        (F.col("ssum") / F.col("n")).alias("ate_aipw"),
        "n_treated",
        (F.col("n") - F.col("n_treated")).alias("n_control"),
        "n",
    )


def did_estimator(
    df: DataFrame,
    value_col: str,
    treat_col,
    post_col,
    *,
    units: float = 1e6,
) -> DataFrame:
    """Difference-in-differences estimate of a treatment effect from a
    2x2 (treated x post) design (Card & Krueger, AER 1994; the
    canonical two-period DiD):

        DiD = (ybar_T,post - ybar_T,pre) - (ybar_C,post - ybar_C,pre)

    ``treat_col`` / ``post_col`` are boolean Columns (or names).  ONE
    map-side-combinable aggregate computes all four cell sums/counts as
    conditional sums of micro-unit-quantized values — exact integers,
    so every mean (and the estimate) is partition- and engine-
    reproducible.  Output: one row with the four cell means, cell
    counts, and ``did``."""
    t = F.col(treat_col) if isinstance(treat_col, str) else treat_col
    p = F.col(post_col) if isinstance(post_col, str) else post_col
    vu = (
        F.floor(F.col(value_col).cast("double") * F.lit(units) + F.lit(0.5))
        .cast("bigint")
    )
    d = df.where(F.col(value_col).isNotNull()).select(
        t.cast("boolean").alias("__t"), p.cast("boolean").alias("__p"),
        vu.alias("__v"),
    )

    def cell(tv: bool, pv: bool, tag: str):
        m = (F.col("__t") == tv) & (F.col("__p") == pv)
        return [
            F.sum(F.when(m, F.col("__v")).otherwise(F.lit(0))
                  .cast("decimal(38,0)")).alias(f"__s_{tag}"),
            F.sum(F.when(m, 1).otherwise(0)).alias(f"n_{tag}"),
        ]

    agg = d.agg(
        *cell(True, False, "t_pre"), *cell(True, True, "t_post"),
        *cell(False, False, "c_pre"), *cell(False, True, "c_post"),
    )

    def mean(tag: str):
        return (
            F.col(f"__s_{tag}").cast("double")
            / F.col(f"n_{tag}").cast("double") / F.lit(units)
        ).alias(f"mean_{tag}")

    out = agg.select(
        mean("t_pre"), mean("t_post"), mean("c_pre"), mean("c_post"),
        "n_t_pre", "n_t_post", "n_c_pre", "n_c_post",
    )
    return out.select(
        "*",
        (
            (F.col("mean_t_post") - F.col("mean_t_pre"))
            - (F.col("mean_c_post") - F.col("mean_c_pre"))
        ).alias("did"),
    )


def rdd_local_linear(
    df: DataFrame,
    running_col: str,
    value_col: str,
    *,
    cutoff: float,
    bandwidth: float,
    units: float = 1e6,
) -> DataFrame:
    """Sharp regression-discontinuity estimate with local-linear fits
    on each side of the cutoff (Thistlethwaite & Campbell 1960;
    Imbens & Lemieux, J. Econometrics 2008): within ``bandwidth`` of
    ``cutoff``, fit ``y ~ a + b*(x - cutoff)`` separately left/right
    (rectangular kernel) and report ``tau = a_right - a_left``.

    Exact-moment discipline: the running variable enters as
    ``du = 2*(x - cutoff)`` scaled to integers via milli-units and the
    outcome as micro-unit integers, so both closed-form intercepts are
    ratios of exact decimal products — bit-reproducible.  ONE
    conditional-sum aggregate; no window, no join."""
    x = F.col(running_col).cast("double")
    # du in milli-units keeps half-integer cutoffs exact
    du = F.floor((x - F.lit(cutoff)) * F.lit(1e3) + F.lit(0.5)) \
        .cast("bigint")
    yu = (
        F.floor(F.col(value_col).cast("double") * F.lit(units) + F.lit(0.5))
        .cast("bigint")
    )
    d = df.where(
        F.col(value_col).isNotNull() & x.isNotNull()
        & (F.abs(x - F.lit(cutoff)) <= F.lit(bandwidth))
    ).select((x >= F.lit(cutoff)).alias("__r"), du.alias("__u"),
             yu.alias("__y"))

    def side(rv: bool, tag: str):
        m = F.col("__r") == rv
        z = F.lit(0).cast("bigint")
        u = F.when(m, F.col("__u")).otherwise(z)
        y = F.when(m, F.col("__y")).otherwise(z)
        return [
            F.sum(F.when(m, 1).otherwise(0)).alias(f"n_{tag}"),
            F.sum(u.cast("decimal(19,0)")).alias(f"__su_{tag}"),
            F.sum(u.cast("decimal(19,0)") * u).alias(f"__suu_{tag}"),
            F.sum(y.cast("decimal(38,0)")).alias(f"__sy_{tag}"),
            F.sum(u.cast("decimal(19,0)") * y).alias(f"__suy_{tag}"),
        ]

    agg = d.agg(*side(False, "left"), *side(True, "right"))

    def fit(tag: str):
        n = F.col(f"n_{tag}").cast("decimal(19,0)")
        su, suu = F.col(f"__su_{tag}"), F.col(f"__suu_{tag}")
        sy, suy = F.col(f"__sy_{tag}"), F.col(f"__suy_{tag}")
        det = (n * suu - su * su).cast("double")
        a = (sy * suu - su * suy).cast("double") / det / F.lit(units)
        b = (n * suy - su * sy).cast("double") / det \
            / F.lit(units) * F.lit(1e3)
        return a.alias(f"a_{tag}"), b.alias(f"b_{tag}")

    out = agg.select(
        *fit("left"), *fit("right"), "n_left", "n_right",
    )
    return out.select(
        (F.col("a_right") - F.col("a_left")).alias("tau"),
        "a_left", "a_right", "b_left", "b_right", "n_left", "n_right",
    )


def covariate_balance(
    df: DataFrame,
    covariate_cols,
    treat_col,
    *,
    units: float = 1e6,
) -> DataFrame:
    """Standardized-mean-difference covariate balance table (Austin,
    Stat. Med. 2009; the standard propensity-diagnostics readout —
    |SMD| < 0.1 is the usual balance rule):

        SMD = (mean_T - mean_C) / sqrt((var_T + var_C) / 2)

    per covariate, from ONE conditional exact-integer moment aggregate
    (values quantized to ``units``, squares decimal-widened) — no
    join, no window, engine-reproducible.  Output: one row per
    covariate ``(covariate, mean_t, mean_c, smd, n_t, n_c)``."""
    covs = (
        [covariate_cols] if isinstance(covariate_cols, str)
        else list(covariate_cols)
    )
    t = (F.col(treat_col) if isinstance(treat_col, str) else treat_col) \
        .cast("boolean")
    aggs = []
    for c in covs:
        x = F.col(c).cast("double")
        xu = F.floor(x * F.lit(units) + F.lit(0.5)).cast("bigint")
        for side, m in (("t", t), ("c", ~t)):
            z = F.lit(0).cast("bigint")
            v = F.when(m & x.isNotNull(), xu).otherwise(z)
            aggs += [
                F.sum(F.when(m & x.isNotNull(), 1).otherwise(0))
                .alias(f"__n_{side}_{c}"),
                F.sum(v.cast("decimal(19,0)")).alias(f"__s_{side}_{c}"),
                F.sum(v.cast("decimal(19,0)") * v)
                .alias(f"__ss_{side}_{c}"),
            ]
    agg = df.agg(*aggs)

    rows = []
    for c in covs:
        def mv(side):
            n = F.col(f"__n_{side}_{c}").cast("decimal(19,0)")
            nd = F.col(f"__n_{side}_{c}").cast("double")
            mean = (F.col(f"__s_{side}_{c}").cast("double") / nd
                    / F.lit(units))
            var = (
                (n * F.col(f"__ss_{side}_{c}")
                 - F.col(f"__s_{side}_{c}") * F.col(f"__s_{side}_{c}"))
                .cast("double")
                / (n * (n - F.lit(1).cast("decimal(19,0)")))
                .cast("double") / F.lit(units * units)
            )
            return mean, var, F.col(f"__n_{side}_{c}")

        mt, vt, nt = mv("t")
        mc, vc, nc = mv("c")
        smd = (mt - mc) / F.sqrt((vt + vc) / F.lit(2.0))
        rows.append(F.struct(
            F.lit(c).alias("covariate"),
            mt.alias("mean_t"), mc.alias("mean_c"),
            smd.alias("smd"),
            nt.cast("bigint").alias("n_t"),
            nc.cast("bigint").alias("n_c"),
        ))
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def srm_check(
    df: DataFrame,
    variant_col: str,
    *,
    expected: tuple[float, float] = (0.5, 0.5),
) -> DataFrame:
    """Sample-ratio-mismatch check for a two-variant experiment
    (Fabijan et al., KDD 2019 — the most common A/B trust failure):
    chi-square goodness of fit of observed variant counts against the
    designed split.

        chi2 = sum_g (n_g - N p_g)^2 / (N p_g),  dof = 1

    ONE conditional-count aggregate; exact integer counts so the
    statistic is engine-reproducible.  Output: ``(n_0, n_1, ratio_0,
    chi2, srm_suspected)`` — flagged above the conventional
    chi2 > 10.83 (p < 0.001) bar."""
    g = F.col(variant_col).cast("int")
    agg = df.where(g.isNotNull()).agg(
        F.sum(F.when(g == 0, 1).otherwise(0)).alias("__n0"),
        F.sum(F.when(g == 1, 1).otherwise(0)).alias("__n1"),
    )
    n0 = F.col("__n0").cast("double")
    n1 = F.col("__n1").cast("double")
    nn = n0 + n1
    e0 = nn * F.lit(expected[0])
    e1 = nn * F.lit(expected[1])
    chi2 = (n0 - e0) * (n0 - e0) / e0 + (n1 - e1) * (n1 - e1) / e1
    return agg.select(
        F.col("__n0").cast("bigint").alias("n_0"),
        F.col("__n1").cast("bigint").alias("n_1"),
        (n0 / nn).alias("ratio_0"),
        chi2.alias("chi2"),
        (chi2 > F.lit(10.827566170662733)).alias("srm_suspected"),
    )


def zip_moment_fit(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """Zero-inflated Poisson fit by the method of moments over per-key
    event counts (Lambert, Technometrics 1992 introduced the ZIP
    model; the moment estimators solve mean = (1-pi) lambda and
    var = mean (1 + lambda - mean)):

        lambda_hat = (var + mean^2 - mean) / mean
        pi_hat     = 1 - mean / lambda_hat

    — the zero-inflation reading beside the negative-binomial
    overdispersion fit (negbin_fit).  On underdispersed data the
    moment pi_hat can be negative; it is reported as computed (the
    standard moment-estimator caveat).  Integer count moments
    end-to-end — deterministic, unrounded.  Returns ONE row
    ``(n_keys, mean, variance, lambda_hat, pi_hat)``."""
    k = F.col(key_col)
    per = df.where(k.isNotNull()).groupBy(k.alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    var = (F.col("q").cast("double") - n * mean * mean) / (
        n - F.lit(1.0)
    )
    lam = (var + mean * mean - mean) / mean
    return agg.select(
        F.col("n").cast("bigint").alias("n_keys"),
        mean.alias("mean"),
        var.alias("variance"),
        lam.alias("lambda_hat"),
        (F.lit(1.0) - mean / lam).alias("pi_hat"),
    )
