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
