"""fit_huber_regression vs a pure-Python IRLS reference + robustness."""

from __future__ import annotations


def _huber_ref(xs, ys, delta, n_iter):
    def wls(ws):
        sw = sum(ws)
        swx = sum(w * x for w, x in zip(ws, xs))
        swxx = sum(w * x * x for w, x in zip(ws, xs))
        swy = sum(w * y for w, y in zip(ws, ys))
        swxy = sum(w * x * y for w, x, y in zip(ws, xs, ys))
        det = sw * swxx - swx * swx
        return (
            (swy * swxx - swx * swxy) / det,
            (sw * swxy - swy * swx) / det,
        )

    c, b = wls([1.0] * len(xs))
    for _ in range(n_iter):
        ws = []
        for x, y in zip(xs, ys):
            r = abs(y - (c + b * x))
            ws.append(1.0 if r <= delta else delta / r)
        c, b = wls(ws)
    return c, b


def test_huber_matches_reference(spark):
    from gofast_spark.ml.regression import fit_huber_regression

    xs = [float(i) for i in range(20)]
    ys = [2.0 + 3.0 * x + (x % 3 - 1) * 0.5 for x in xs]
    ys[5] = 500.0  # gross outlier
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    m = fit_huber_regression(df, "x", "y", delta=2.0, n_iter=3)
    c, b = _huber_ref(xs, ys, 2.0, 3)
    assert abs(m["intercept"] - c) < 1e-8
    assert abs(m["slope"] - b) < 1e-8
    assert m["n"] == 20


def test_huber_resists_outliers_vs_ols(spark):
    from gofast_spark.ml.regression import (
        fit_huber_regression,
        fit_linear_regression,
    )

    xs = [float(i) for i in range(30)]
    ys = [1.0 + 2.0 * x for x in xs]
    for i in (4, 11, 19):
        ys[i] += 300.0
    df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
    hub = fit_huber_regression(df, "x", "y", delta=3.0, n_iter=5)
    ols = fit_linear_regression(df, ["x"], "y")
    ols_slope = ols["coef"][1]
    assert abs(hub["slope"] - 2.0) < 0.15
    assert abs(ols_slope - 2.0) > abs(hub["slope"] - 2.0)
