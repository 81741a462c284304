"""fit_gmm2 vs a pure-Python EM reference + separation recovery."""

from __future__ import annotations

import math

import numpy as np


def _ref_gmm2(xs, n_iter, min_var=1e-6):
    n = len(xs)
    m = sum(xs) / n
    v = max(sum((x - m) ** 2 for x in xs) / n, min_var)
    s = math.sqrt(v)
    pi1, m1, v1, m2, v2 = 0.5, m - s, v, m + s, v

    def pdf(x, mean, var):
        return math.exp(-((x - mean) ** 2) / (2.0 * var)) / math.sqrt(
            2.0 * math.pi * var
        )

    for _ in range(n_iter):
        w1 = sx1 = sxx1 = sx = sxx = 0.0
        for x in xs:
            p1 = pi1 * pdf(x, m1, v1)
            p2 = (1.0 - pi1) * pdf(x, m2, v2)
            r1 = p1 / (p1 + p2)
            w1 += r1
            sx1 += r1 * x
            sxx1 += r1 * x * x
            sx += x
            sxx += x * x
        w2 = n - w1
        m1 = sx1 / w1
        v1 = max(sxx1 / w1 - m1 * m1, min_var)
        m2 = (sx - sx1) / w2
        v2 = max((sxx - sxx1) / w2 - m2 * m2, min_var)
        pi1 = w1 / n
    return pi1, m1, v1, m2, v2


def test_gmm2_matches_reference(spark):
    from gofast_spark.ml.mixture_em import fit_gmm2

    rng = np.random.RandomState(2)
    xs = list(rng.normal(0, 1, 200)) + list(rng.normal(6, 1.5, 300))
    xs = [float(x) for x in xs]
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = fit_gmm2(df, "x", n_iter=4)
    pi1, m1, v1, m2, v2 = _ref_gmm2(xs, 4)
    assert abs(got["pi"] - pi1) < 1e-7
    assert abs(got["mean1"] - m1) < 1e-6
    assert abs(got["var1"] - v1) < 1e-6
    assert abs(got["mean2"] - m2) < 1e-6
    assert abs(got["var2"] - v2) < 1e-6
    assert got["n"] == len(xs)


def test_gmm2_separates_well_separated_modes(spark):
    from gofast_spark.ml.mixture_em import fit_gmm2

    rng = np.random.RandomState(7)
    xs = [float(x) for x in rng.normal(-5, 0.5, 400)] + [
        float(x) for x in rng.normal(5, 0.5, 400)
    ]
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = fit_gmm2(df, "x", n_iter=10)
    lo, hi = sorted([got["mean1"], got["mean2"]])
    assert abs(lo + 5) < 0.3
    assert abs(hi - 5) < 0.3
    assert abs(got["pi"] - 0.5) < 0.05
