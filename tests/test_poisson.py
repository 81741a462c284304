"""fit_poisson_regression vs a pure-Python Newton reference."""

from __future__ import annotations

import math

import numpy as np


def _ref(xs, ys, n_iter):
    c = b = 0.0
    for _ in range(n_iter):
        h00 = h01 = h11 = g0 = g1 = 0.0
        for x, y in zip(xs, ys):
            mu = math.exp(c + b * x)
            h00 += mu
            h01 += mu * x
            h11 += mu * x * x
            g0 += y - mu
            g1 += (y - mu) * x
        det = h00 * h11 - h01 * h01
        c += (g0 * h11 - h01 * g1) / det
        b += (h00 * g1 - g0 * h01) / det
    return c, b


def test_poisson_matches_reference_and_recovers_rate(spark):
    from gofast_spark.ml.regression import fit_poisson_regression

    rng = np.random.RandomState(4)
    xs = [float(x) for x in rng.uniform(0, 2, 500)]
    ys = [float(rng.poisson(math.exp(0.4 + 0.9 * x))) for x in xs]
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    m = fit_poisson_regression(df, "x", "y", n_iter=6)
    c, b = _ref(xs, ys, 6)
    assert abs(m["intercept"] - c) < 1e-8
    assert abs(m["slope"] - b) < 1e-8
    # recovers the planted log-rate
    assert abs(m["intercept"] - 0.4) < 0.15
    assert abs(m["slope"] - 0.9) < 0.15
    assert m["n"] == 500
