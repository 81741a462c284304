"""Probability column functions (SURVEY §2.10 probability row).

Reference: ``normal_pdf``/``normal_cdf`` (gofast/stats/probs.py:236, 303),
``binomial_pmf`` (:362), ``poisson_logpmf`` (:425), ``uniform_sampling``
(:504).  All are pure column expressions; the normal CDF uses the
Abramowitz-Stegun 7.1.26 rational erf approximation (|error| < 1.5e-7)
because neither Spark SQL nor most engines expose erf.  The reference's
PyMC models (:37, 129) are out of engine scope (driver-side Bayesian
fitting).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SQRT2PI = math.sqrt(2.0 * math.pi)


def normal_pdf(x: Column, *, mu: float = 0.0, sigma: float = 1.0) -> Column:
    """Gaussian density (gofast/stats/probs.py:236)."""
    z = (x - mu) / sigma
    return F.exp(-0.5 * z * z) / (sigma * _SQRT2PI)


def _erf_approx(x: Column) -> Column:
    """Abramowitz-Stegun 7.1.26 erf for x >= 0 (|error| < 1.5e-7)."""
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    t = 1.0 / (1.0 + p * x)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    return 1.0 - poly * F.exp(-x * x)


def normal_cdf(x: Column, *, mu: float = 0.0, sigma: float = 1.0) -> Column:
    """Gaussian CDF via the erf approximation
    (gofast/stats/probs.py:303)."""
    z = (x - mu) / (sigma * math.sqrt(2.0))
    pos = 0.5 * (1.0 + _erf_approx(F.abs(z)))
    return F.when(z >= 0, pos).otherwise(1.0 - pos)


def poisson_logpmf(k: Column, *, lam: float) -> Column:
    """log P(K=k) for Poisson(lam) (gofast/stats/probs.py:425):
    ``k ln lam - lam - ln k!`` with ``ln k!`` summed exactly via
    ``aggregate(sequence(1, k))`` — integer-k column, no gamma function
    needed."""
    lnfact = F.when(k <= 1, F.lit(0.0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(2), k.cast("int")),
            F.lit(0.0),
            lambda acc, i: acc + F.log(i.cast("double")),
        )
    )
    return k * math.log(lam) - lam - lnfact


def binomial_pmf(k: Column, *, n: int, p: float) -> Column:
    """P(K=k) for Binomial(n, p) (gofast/stats/probs.py:362) via exact
    log-factorials (column ``ln k!`` as above, constant ``ln n!``)."""
    def lnfact_col(c: Column) -> Column:
        return F.when(c <= 1, F.lit(0.0)).otherwise(
            F.aggregate(
                F.sequence(F.lit(2), c.cast("int")),
                F.lit(0.0),
                lambda acc, i: acc + F.log(i.cast("double")),
            )
        )

    ln_n_fact = math.lgamma(n + 1)
    logpmf = (
        ln_n_fact
        - lnfact_col(k)
        - lnfact_col(F.lit(n) - k)
        + k * math.log(p)
        + (F.lit(n) - k) * math.log(1.0 - p)
    )
    return F.exp(logpmf)


def uniform_sampling(
    df: DataFrame, lo: float, hi: float, *, out_col: str = "u", seed: int = 42
) -> DataFrame:
    """Append a Uniform(lo, hi) draw per row
    (gofast/stats/probs.py:504)."""
    return df.withColumn(out_col, F.rand(seed) * (hi - lo) + lo)


# Acklam's rational approximation to the inverse normal CDF (Peter
# Acklam 2003, public algorithm; |relative error| < 1.15e-9).  The
# coefficient tuples are shared with the SQL replay generator in
# plans/catalog_stats so both engines evaluate one expression tree.
PPF_A = (
    -3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02,
    -3.066479806614716e+01, 2.506628277459239e+00,
)
PPF_B = (
    -5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01,
    -1.328068155288572e+01,
)
PPF_C = (
    -7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00,
    4.374664141464968e+00, 2.938163982698783e+00,
)
PPF_D = (
    7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00,
)
PPF_P_LOW = 0.02425


def _ppf_tail(q: Column) -> Column:
    """Tail branch of Acklam: x(q) for q = sqrt(-2 ln p)."""
    c, d = PPF_C, PPF_D
    num = (
        ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
        + c[5]
    )
    den = (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
    return num / den


def normal_ppf(p: Column) -> Column:
    """Standard-normal quantile function Phi^{-1}(p) via Acklam's
    piecewise rational approximation — pure column arithmetic (no
    UDF), the inverse companion of :func:`normal_cdf`.  Input must be
    strictly inside (0, 1)."""
    a, b = PPF_A, PPF_B
    q_lo = F.sqrt(F.lit(-2.0) * F.log(p))
    q_hi = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p))
    qc = p - 0.5
    r = qc * qc
    num = (
        ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
        + a[5]
    )
    den = ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    return (
        F.when(p < PPF_P_LOW, _ppf_tail(q_lo))
        .when(p > 1.0 - PPF_P_LOW, -_ppf_tail(q_hi))
        .otherwise(num * qc / den)
    )
