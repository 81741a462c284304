"""granger_causality vs a numpy least-squares reference."""

from __future__ import annotations

import numpy as np


def _granger_ref(x, y):
    y_t = np.asarray(y[1:], dtype=float)
    l_t = np.asarray(y[:-1], dtype=float)
    x_t = np.asarray(x[:-1], dtype=float)
    n = len(y_t)
    Xu = np.column_stack([np.ones(n), l_t, x_t])
    Xr = np.column_stack([np.ones(n), l_t])
    bu, *_ = np.linalg.lstsq(Xu, y_t, rcond=None)
    br, *_ = np.linalg.lstsq(Xr, y_t, rcond=None)
    sse_u = float(np.sum((y_t - Xu @ bu) ** 2))
    sse_r = float(np.sum((y_t - Xr @ br) ** 2))
    f = (sse_r - sse_u) / (sse_u / (n - 3))
    return n, sse_r, sse_u, f


def test_granger_matches_numpy(spark):
    from gofast_spark.ts.causality import granger_causality

    rng = np.random.RandomState(7)
    x = list(rng.randint(5, 50, size=24))
    # y driven by lagged x plus AR noise -> should Granger-cause
    y = [10]
    for t in range(1, 24):
        y.append(int(0.5 * y[-1] + 0.8 * x[t - 1] + rng.randint(0, 5)))
    df = spark.createDataFrame(
        [(i, int(x[i]), int(y[i])) for i in range(24)], ["d", "x", "y"]
    )
    row = granger_causality(df, "d", "x", "y", scale=1.0).collect()[0]
    n, sse_r, sse_u, f = _granger_ref(x, y)
    assert row["n"] == n
    assert abs(row["sse_r"] - sse_r) < 1e-6 * max(1.0, sse_r)
    assert abs(row["sse_u"] - sse_u) < 1e-6 * max(1.0, sse_u)
    assert abs(row["f_stat"] - f) < 1e-6 * max(1.0, abs(f))
    assert row["f_stat"] > 10  # the planted dependence is detected


def test_granger_independent_series_small_f(spark):
    from gofast_spark.ts.causality import granger_causality

    rng = np.random.RandomState(3)
    x = rng.randint(5, 50, size=40)
    y = rng.randint(5, 50, size=40)
    df = spark.createDataFrame(
        [(i, int(x[i]), int(y[i])) for i in range(40)], ["d", "x", "y"]
    )
    row = granger_causality(df, "d", "x", "y").collect()[0]
    nf, sse_r, sse_u, f = _granger_ref(list(x), list(y))
    assert abs(row["f_stat"] - f) < 1e-6 * max(1.0, abs(f))
    assert row["f_stat"] < 5


def test_granger_repartition_invariant(spark):
    from gofast_spark.ts.causality import granger_causality

    rows = [(i, (i * 7) % 13 + 1, (i * 5) % 11 + 2) for i in range(30)]
    df = spark.createDataFrame(rows, ["d", "x", "y"])
    a = granger_causality(df, "d", "x", "y").collect()[0]
    b = granger_causality(df.repartition(8), "d", "x", "y").collect()[0]
    assert tuple(a) == tuple(b)
