"""Unit tests: closed-form stacking regressor (ml/stacking.py)."""

from __future__ import annotations

import numpy as np
import pytest


def _ridge_1f(x, y, lam):
    n = len(x)
    A = np.array([[n, x.sum()], [x.sum(), (x * x).sum() + lam]])
    b = np.array([y.sum(), (x * y).sum()])
    return np.linalg.solve(A, b)


def test_stacking_matches_numpy_refit(spark):
    from gofast_spark.ml.stacking import fit_stacking_ols

    rng = np.random.RandomState(4)
    # milli-unit-friendly values (3 decimals max) so quantization is a no-op
    x1 = np.round(rng.uniform(0, 50, 400), 3)
    x2 = np.round(rng.uniform(0, 10, 400), 3)
    y = np.round(3.0 * x1 - 7.0 * x2 + rng.uniform(0, 5, 400), 3)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    r = fit_stacking_ols(df, "x1", "x2", "y", base_ridge=1000.0).collect()[0]

    a1, b1 = _ridge_1f(x1, y, 1000.0)
    a2, b2 = _ridge_1f(x2, y, 1000.0)
    assert r["a1"] == pytest.approx(a1, rel=1e-9)
    assert r["b1"] == pytest.approx(b1, rel=1e-9)
    assert r["a2"] == pytest.approx(a2, rel=1e-9)
    assert r["b2"] == pytest.approx(b2, rel=1e-9)

    p1 = a1 + b1 * x1
    p2 = a2 + b2 * x2
    X = np.column_stack([np.ones_like(p1), p1, p2])
    w, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert r["w0"] == pytest.approx(w[0], rel=1e-6, abs=1e-6)
    assert r["w1"] == pytest.approx(w[1], rel=1e-6)
    assert r["w2"] == pytest.approx(w[2], rel=1e-6)

    pred = X @ np.array([r["w0"], r["w1"], r["w2"]])
    rmse = float(np.sqrt(np.mean((y - pred) ** 2)))
    assert r["rmse"] == pytest.approx(rmse, rel=1e-6)
    # the stack must beat either base alone on training RMSE
    rmse1 = float(np.sqrt(np.mean((y - p1) ** 2)))
    rmse2 = float(np.sqrt(np.mean((y - p2) ** 2)))
    assert r["rmse"] <= min(rmse1, rmse2) + 1e-9


def test_stacking_null_rows_dropped(spark):
    from gofast_spark.ml.stacking import fit_stacking_ols

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 1.0, 4.0), (3.0, 4.0, 9.0),
         (4.0, 2.0, 11.0), (None, 1.0, 1.0), (1.0, None, 1.0)],
        "x1 double, x2 double, y double",
    )
    r = fit_stacking_ols(df, "x1", "x2", "y").collect()[0]
    assert r["n"] == 4
