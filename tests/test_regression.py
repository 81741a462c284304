"""Closed-form OLS/ridge (ml/regression.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gofast_spark.ml import fit_linear_regression, predict_linear


def _frame(spark):
    # exact plane y = 2 + 3*x1 - 0.5*x2, no noise
    rows = [
        (float(x1), float(x2), 2.0 + 3.0 * x1 - 0.5 * x2)
        for x1 in range(1, 9)
        for x2 in range(0, 5)
    ]
    return spark.createDataFrame(rows, "x1 double, x2 double, y double")


def test_exact_recovery_numpy(spark):
    m = fit_linear_regression(_frame(spark), ["x1", "x2"], "y")
    w = m["coef"]
    assert w[0] == pytest.approx(2.0, abs=1e-8)
    assert w[1] == pytest.approx(3.0, abs=1e-8)
    assert w[2] == pytest.approx(-0.5, abs=1e-8)
    assert m["r2"] == pytest.approx(1.0, abs=1e-9)
    assert m["n"] == 40


def test_cramer_matches_numpy(spark):
    d = _frame(spark).withColumn(
        "y", F.col("y") + (F.col("x1") * 7919).cast("int") % 3  # add noise
    )
    a = fit_linear_regression(d, ["x1", "x2"], "y", solver="numpy")
    b = fit_linear_regression(d, ["x1", "x2"], "y", solver="cramer")
    for wa, wb in zip(a["coef"], b["coef"]):
        assert wa == pytest.approx(wb, rel=1e-9)
    assert a["r2"] == pytest.approx(b["r2"], rel=1e-9)


def test_ridge_shrinks_toward_zero(spark):
    d = _frame(spark)
    ols = fit_linear_regression(d, ["x1"], "y")
    rid = fit_linear_regression(d, ["x1"], "y", ridge=1000.0)
    assert abs(rid["coef"][1]) < abs(ols["coef"][1])
    # intercept is unpenalized but re-balances; slope strictly shrinks


def test_no_intercept(spark):
    rows = [(float(x), 4.0 * x) for x in range(1, 20)]
    d = spark.createDataFrame(rows, "x double, y double")
    m = fit_linear_regression(d, ["x"], "y", intercept=False)
    assert len(m["coef"]) == 1
    assert m["coef"][0] == pytest.approx(4.0, abs=1e-9)


def test_nulls_excluded(spark):
    d = _frame(spark).union(
        spark.createDataFrame([(None, 1.0, 5.0)], "x1 double, x2 double, y double")
    )
    m = fit_linear_regression(d, ["x1", "x2"], "y")
    assert m["n"] == 40


def test_predict_linear(spark):
    d = _frame(spark)
    m = fit_linear_regression(d, ["x1", "x2"], "y")
    pred = predict_linear(d, m, ["x1", "x2"])
    mx = pred.agg(F.max(F.abs(F.col("prediction") - F.col("y")))).first()[0]
    assert mx < 1e-8


def test_errors(spark):
    d = _frame(spark)
    with pytest.raises(ValueError):
        fit_linear_regression(d, ["x1", "x2"], "y", solver="qr")
    with pytest.raises(ValueError):
        fit_linear_regression(d.where("y > 1e9"), ["x1"], "y")
    # collinear features -> singular system under cramer
    dd = d.withColumn("x3", F.col("x1") * 2)
    with pytest.raises(ValueError):
        fit_linear_regression(dd, ["x1", "x3"], "y", solver="cramer")
    with pytest.raises(ValueError):
        predict_linear(d, [1.0, 2.0], ["x1", "x2"])


def test_single_aggregation_plan(spark):
    """The fit is one job over one aggregate — verify the moment frame
    aggregates in a single pass (no join, no window)."""
    d = _frame(spark)
    # reproduce the internal agg shape and check its plan
    aggs = [F.sum(F.col("x1") * F.col("x1")).alias("a")]
    plan = d.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan


def test_logistic_separates(spark):
    from gofast_spark.ml import fit_logistic_regression

    # y = 1 when x > 0 with logistic noise-free margin: strong positive slope
    rows = [(float(x) / 10.0, 1.0 if x > 0 else 0.0)
            for x in range(-50, 51) if x != 0]
    d = spark.createDataFrame(rows, "x double, y double")
    m = fit_logistic_regression(d, ["x"], "y", n_iter=8)
    assert m["coef"][1] > 2.0          # steep positive slope
    assert abs(m["coef"][0]) < 1.0     # near-symmetric intercept
    assert m["n"] == 100
    assert m["log_likelihood"] > -25.0


def test_logistic_balanced_probability(spark):
    from gofast_spark.ml import fit_logistic_regression

    # constant feature, 30% positives, intercept-only signal:
    # sigmoid(w0) should converge to the base rate
    import math

    # x = +/-1 exactly balanced within each class -> slope 0
    rows = [(1.0 if i % 2 == 0 else -1.0, 1.0 if i < 30 else 0.0)
            for i in range(100)]
    d = spark.createDataFrame(rows, "x double, y double")
    m = fit_logistic_regression(d, ["x"], "y", n_iter=6, solver="cramer")
    base = 1.0 / (1.0 + math.exp(-m["coef"][0]))
    assert base == pytest.approx(0.3, abs=1e-6)
    assert m["coef"][1] == pytest.approx(0.0, abs=1e-9)


def test_logistic_cramer_matches_numpy(spark):
    from gofast_spark.ml import fit_logistic_regression

    rows = [(float(x) / 7.0, 1.0 if (x * 2654435761) % 97 < 40 + x else 0.0)
            for x in range(-40, 41)]
    d = spark.createDataFrame(rows, "x double, y double")
    a = fit_logistic_regression(d, ["x"], "y", n_iter=4, solver="numpy")
    b = fit_logistic_regression(d, ["x"], "y", n_iter=4, solver="cramer")
    for wa, wb in zip(a["coef"], b["coef"]):
        assert wa == pytest.approx(wb, rel=1e-9)


def test_logistic_errors(spark):
    from gofast_spark.ml import fit_logistic_regression

    d = spark.createDataFrame([(1.0, 2.0, 1.0)], "x double, z double, y double")
    with pytest.raises(ValueError):
        fit_logistic_regression(d, ["x", "z", "x"], "y", solver="cramer")
    with pytest.raises(ValueError):
        fit_logistic_regression(d, ["x"], "y", solver="sgd")


def test_grouped_ols_matches_per_group_global_fit(spark):
    """Each group's in-plan Cramer solve must equal the driver-side
    fit on that group's rows alone."""
    import random

    from gofast_spark.ml.regression import (
        fit_linear_regression,
        fit_linear_regression_grouped,
    )

    rng = random.Random(4)
    rows = []
    for g, (a, b, c) in (("g1", (2.0, 3.0, -1.0)), ("g2", (-1.0, 0.5, 4.0))):
        for _ in range(60):
            x1, x2 = rng.uniform(0, 10), rng.uniform(0, 5)
            rows.append(
                (g, x1, x2, a + b * x1 + c * x2 + rng.gauss(0, 0.1))
            )
    df = spark.createDataFrame(rows, ["g", "x1", "x2", "y"])
    grouped = {
        r["g"]: r
        for r in fit_linear_regression_grouped(
            df, ["x1", "x2"], "y", ["g"]
        ).collect()
    }
    for g in ("g1", "g2"):
        solo = fit_linear_regression(
            df.where(df.g == g), ["x1", "x2"], "y", solver="cramer"
        )
        got = grouped[g]
        for i in range(3):
            assert got[f"w_{i}"] == pytest.approx(solo["coef"][i], rel=1e-9)
        assert got["r2"] == pytest.approx(solo["r2"], rel=1e-9)
        assert got["n"] == solo["n"]


def test_grouped_ols_singular_group_yields_nulls(spark):
    from gofast_spark.ml.regression import fit_linear_regression_grouped

    # constant feature -> singular normal equations for that group only
    rows = [("bad", 1.0, 2.0), ("bad", 1.0, 3.0), ("bad", 1.0, 4.0)]
    rows += [("ok", float(i), 2.0 * i + 1 + 0.01 * (i % 2)) for i in range(5)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {
        r["g"]: r
        for r in fit_linear_regression_grouped(
            df, ["x"], "y", ["g"]
        ).collect()
    }
    assert out["bad"]["w_0"] is None and out["bad"]["w_1"] is None
    assert out["ok"]["w_1"] is not None
