"""Two-component 1-D Gaussian mixture by EM with a fixed iteration
budget.

Public basis: Dempster, Laird & Rubin (JRSS-B 1977); the univariate
two-component special case is the classic mixture-of-Gaussians EM.

Spark shape — the fit_logistic_regression discipline: every E+M step
is ONE distributed aggregate (responsibility-weighted moments; the
responsibilities are row-local expressions at the current parameters),
with a closed-form driver-side parameter update between jobs.  The
iteration count is FIXED so the whole trajectory is deterministic and
a SQL oracle can replay every layer.  Initialization is deterministic
too: components start at mean -/+ stddev with equal weights (a
standard moment-based init), so no RNG anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_gmm2"]


def fit_gmm2(
    df: DataFrame,
    value_col: str,
    *,
    n_iter: int = 3,
    min_var: float = 1e-6,
) -> dict:
    """EM for ``x ~ pi*N(m1, v1) + (1-pi)*N(m2, v2)``.

    Returns ``{"pi", "mean1", "var1", "mean2", "var2", "n",
    "log_likelihood"}``.  ``min_var`` floors both variances each
    M-step (degenerate-component guard).  Costs ``n_iter + 2`` Spark
    jobs total, each reducing to one moment row.
    """
    x = F.col(value_col).cast("double")
    d = df.where(x.isNotNull())
    row = d.agg(
        F.avg(x).alias("m"),
        F.var_pop(x).alias("v"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    n = int(row["n"])
    if n == 0:
        raise ValueError("no rows to fit on")
    m, v = float(row["m"]), max(float(row["v"]), min_var)
    s = math.sqrt(v)
    pi1, m1, v1, m2, v2 = 0.5, m - s, v, m + s, v

    def _pdf(mean: float, var: float):
        return F.exp(
            -(x - F.lit(mean)) * (x - F.lit(mean)) / F.lit(2.0 * var)
        ) / F.lit(math.sqrt(2.0 * math.pi * var))

    for _ in range(int(n_iter)):
        p1 = F.lit(pi1) * _pdf(m1, v1)
        p2 = F.lit(1.0 - pi1) * _pdf(m2, v2)
        r1 = p1 / (p1 + p2)
        agg = d.agg(
            F.sum(r1).alias("w1"),
            F.sum(r1 * x).alias("sx1"),
            F.sum(r1 * x * x).alias("sxx1"),
            F.sum(x).alias("sx"),
            F.sum(x * x).alias("sxx"),
        ).first()
        w1 = float(agg["w1"])
        w2 = n - w1
        m1 = float(agg["sx1"]) / w1
        v1 = max(float(agg["sxx1"]) / w1 - m1 * m1, min_var)
        m2 = (float(agg["sx"]) - float(agg["sx1"])) / w2
        v2 = max(
            (float(agg["sxx"]) - float(agg["sxx1"])) / w2 - m2 * m2, min_var
        )
        pi1 = w1 / n
    ll = d.agg(
        F.sum(
            F.log(
                F.lit(pi1) * _pdf(m1, v1) + F.lit(1.0 - pi1) * _pdf(m2, v2)
            )
        ).alias("ll")
    ).first()["ll"]
    return {
        "pi": pi1,
        "mean1": m1,
        "var1": v1,
        "mean2": m2,
        "var2": v2,
        "n": n,
        "log_likelihood": float(ll),
    }
