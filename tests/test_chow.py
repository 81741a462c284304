"""chow_test vs a numpy two-segment OLS reference."""

from __future__ import annotations

import numpy as np


def _sse(ts, ys):
    A = np.column_stack([np.ones(len(ts)), ts])
    w, *_ = np.linalg.lstsq(A, np.asarray(ys), rcond=None)
    r = np.asarray(ys) - A @ w
    return float(r @ r)


def test_chow_matches_numpy(spark):
    from gofast_spark.ts.changepoint import chow_test

    rng = np.random.RandomState(3)
    ts = list(range(30))
    # slope changes at t=15
    ys = [
        round(2.0 + 1.0 * t + float(rng.normal(0, 0.5)), 3)
        if t < 15
        else round(2.0 + 3.0 * t - 30.0 + float(rng.normal(0, 0.5)), 3)
        for t in ts
    ]
    df = spark.createDataFrame(list(zip(ts, ys)), ["t", "v"])
    row = chow_test(df, "t", "v", split=15.0).collect()[0]
    s1 = _sse(ts[:15], ys[:15])
    s2 = _sse(ts[15:], ys[15:])
    sp = _sse(ts, ys)
    n = len(ts)
    f = ((sp - s1 - s2) / 2.0) / ((s1 + s2) / (n - 4))
    assert row["n1"] == 15 and row["n2"] == 15
    assert abs(row["sse_pooled"] - sp) < 1e-3 * max(1.0, sp)
    assert abs(row["sse_1"] - s1) < 1e-2
    assert abs(row["sse_2"] - s2) < 1e-2
    assert abs(row["f_stat"] - f) < 1e-2 * max(1.0, f)
    assert row["f_stat"] > 10  # the planted break is detected


def test_chow_no_break_small_f(spark):
    from gofast_spark.ts.changepoint import chow_test

    rng = np.random.RandomState(8)
    ts = list(range(40))
    ys = [round(1.0 + 0.5 * t + float(rng.normal(0, 0.3)), 3) for t in ts]
    df = spark.createDataFrame(list(zip(ts, ys)), ["t", "v"])
    row = chow_test(df, "t", "v", split=20.0).collect()[0]
    assert row["f_stat"] < 4
