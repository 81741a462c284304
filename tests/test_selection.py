"""ml/selection.py: deterministic folds + one-pass CV vs a plain-Python
reference (numpy normal equations per fold)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofast_spark.ml.selection import (
    _LCG_A,
    _LCG_C,
    _LCG_M,
    cross_val_linear,
    kfold_assign,
    ridge_cv_sweep,
)


def _synth(spark, n=400, seed=3):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, 120, size=n)
    x1 = rng.rand(n) * 10
    x2 = rng.rand(n)
    y = 2.0 + 1.5 * x1 - 4.0 * x2 + rng.randn(n) * 0.1
    rows = [(int(i), float(a), float(b), float(c))
            for i, a, b, c in zip(ids, x1, x2, y)]
    return rows, spark.createDataFrame(
        rows, "id bigint, x1 double, x2 double, y double"
    )


def _py_fold(i, k, seed=0):
    return ((i + seed) * _LCG_A + _LCG_C) % _LCG_M % k


def test_kfold_assign_deterministic_and_id_coherent(spark):
    _rows, df = _synth(spark)
    out = kfold_assign(df, "id", 4).select("id", "fold")
    got = {(r["id"], r["fold"]) for r in out.collect()}
    assert got == {(r["id"], r["fold"])
                   for r in out.repartition(13).collect()}
    for i, f in got:
        assert f == _py_fold(i, 4)
    # id coherence: one fold per id
    per_id = {}
    for i, f in got:
        per_id.setdefault(i, set()).add(f)
    assert all(len(v) == 1 for v in per_id.values())


def _py_cv(rows, k, ridge=0.0, seed=0):
    """Per-fold numpy reference: explicit refit on the train rows."""
    out = {}
    for f in range(k):
        train = [(x1, x2, y) for i, x1, x2, y in rows
                 if _py_fold(i, k, seed) != f]
        test = [(x1, x2, y) for i, x1, x2, y in rows
                if _py_fold(i, k, seed) == f]
        X = np.array([[1.0, a, b] for a, b, _ in train])
        yv = np.array([c for _, _, c in train])
        A = X.T @ X
        A[1, 1] += ridge
        A[2, 2] += ridge
        w = np.linalg.solve(A, X.T @ yv)
        Xt = np.array([[1.0, a, b] for a, b, _ in test])
        yt = np.array([c for _, _, c in test])
        resid = yt - Xt @ w
        out[f] = (len(test), float(np.sqrt(np.mean(resid ** 2))), w)
    return out


def test_cross_val_linear_matches_numpy_refit(spark):
    rows, df = _synth(spark)
    got = {r["fold"]: r for r in
           cross_val_linear(df, ["x1", "x2"], "y", id_col="id",
                            k=4).collect()}
    ref = _py_cv(rows, 4)
    assert set(got) == set(ref)
    for f in ref:
        n_ref, rmse_ref, w_ref = ref[f]
        assert got[f]["n_test"] == n_ref
        assert got[f]["rmse"] == pytest.approx(rmse_ref, rel=1e-8)
        assert got[f]["w0"] == pytest.approx(w_ref[0], rel=1e-7)
        assert got[f]["w1"] == pytest.approx(w_ref[1], rel=1e-7)
        assert got[f]["w2"] == pytest.approx(w_ref[2], rel=1e-7)


def test_ridge_cv_sweep_matches_per_lambda_refits(spark):
    rows, df = _synth(spark)
    lams = [0.0, 10.0, 1000.0]
    got = {r["lam"]: r["mean_rmse"] for r in
           ridge_cv_sweep(df, ["x1", "x2"], "y", id_col="id",
                          lambdas=lams, k=4).collect()}
    for lam in lams:
        ref = _py_cv(rows, 4, ridge=lam)
        mean_ref = sum(v[1] for v in ref.values()) / 4
        assert got[lam] == pytest.approx(mean_ref, rel=1e-8)
    # lambda=0 sweep row == plain CV mean
    cv = cross_val_linear(df, ["x1", "x2"], "y", id_col="id", k=4)
    mean0 = cv.agg(F.avg("rmse")).first()[0]
    assert got[0.0] == pytest.approx(mean0, rel=1e-12)


def test_cv_raises_on_empty_fold(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, 3.0), (1, 2.0, 1.0, 4.0)],
        "id bigint, x1 double, x2 double, y double",
    )
    with pytest.raises(ValueError, match="empty folds"):
        cross_val_linear(df, ["x1", "x2"], "y", id_col="id", k=4)


def test_learning_curve_matches_numpy_refits(spark):
    from gofast_spark.ml.selection import learning_curve_linear

    rows, df = _synth(spark)
    n_steps = 3
    k = n_steps + 1
    got = {r["step"]: r for r in
           learning_curve_linear(df, ["x1", "x2"], "y", id_col="id",
                                 n_steps=n_steps).collect()}
    test = [(a, b, c) for i, a, b, c in rows if _py_fold(i, k) == k - 1]
    Xt = np.array([[1.0, a, b] for a, b, _ in test])
    yt = np.array([c for _, _, c in test])
    for j in range(1, n_steps + 1):
        train = [(a, b, c) for i, a, b, c in rows if _py_fold(i, k) < j]
        X = np.array([[1.0, a, b] for a, b, _ in train])
        yv = np.array([c for _, _, c in train])
        w = np.linalg.solve(X.T @ X, X.T @ yv)
        rmse = float(np.sqrt(np.mean((yt - Xt @ w) ** 2)))
        assert got[j]["n_train"] == len(train)
        assert got[j]["n_test"] == len(test)
        assert got[j]["rmse"] == pytest.approx(rmse, rel=1e-8)
