"""Evaluation statistics: Jarque-Bera, chi2 GOF, AIC/BIC, Durbin-Watson
(reference gofast/stats/evaluation.py classes, moment-based)."""

from __future__ import annotations

import math

import pytest


def test_jarque_bera_normal_vs_skewed(spark):
    import numpy as np

    from gofast_spark.stats import jarque_bera

    rng = np.random.default_rng(2)
    normal = [(float(v), "n") for v in rng.normal(0, 1, 3000)]
    skewed = [(float(v), "s") for v in rng.exponential(1.0, 3000)]
    df = spark.createDataFrame(normal + skewed, ["x", "kind"])
    jb_n = jarque_bera(df.filter("kind = 'n'"), "x").collect()[0]
    jb_s = jarque_bera(df.filter("kind = 's'"), "x").collect()[0]
    # normal sample: JB small (chi2_2 95% crit ~ 5.99 -- allow slack)
    assert jb_n["jb_stat"] < 9.0
    assert abs(jb_n["skewness"]) < 0.2
    # exponential: skew ~ 2, kurtosis ~ 9 -> JB enormous
    assert jb_s["jb_stat"] > 500.0
    assert jb_s["skewness"] == pytest.approx(2.0, abs=0.5)


def test_chi2_gof_uniform_and_expected(spark):
    from gofast_spark.stats import chi2_gof

    rows = [("a",)] * 50 + [("b",)] * 50 + [("c",)] * 50
    df = spark.createDataFrame(rows, ["c"])
    out = chi2_gof(df, "c").collect()[0]
    assert out["chi2_stat"] == pytest.approx(0.0)
    assert out["dof"] == 2
    # against explicit shares: expected (75, 45, 30)
    out2 = chi2_gof(
        df, "c", expected_shares={"a": 0.5, "b": 0.3, "c": 0.2}
    ).collect()[0]
    expect = (50 - 75) ** 2 / 75 + (50 - 45) ** 2 / 45 + (50 - 30) ** 2 / 30
    assert out2["chi2_stat"] == pytest.approx(expect)


def test_aic_bic_penalizes_parameters(spark):
    from gofast_spark.stats import aic_bic

    rows = [(float(i), float(i) + 0.1) for i in range(100)]
    df = spark.createDataFrame(rows, ["y", "yhat"])
    a2 = aic_bic(df, "y", "yhat", n_params=2).collect()[0]
    a5 = aic_bic(df, "y", "yhat", n_params=5).collect()[0]
    assert a5["aic"] == pytest.approx(a2["aic"] + 6.0)
    assert a5["bic"] == pytest.approx(a2["bic"] + 3 * math.log(100))
    assert a2["rss"] == pytest.approx(100 * 0.01, rel=1e-6)


def test_durbin_watson_bounds(spark):
    from gofast_spark.stats import durbin_watson

    # alternating residuals -> DW ~ 4 (strong negative autocorr)
    alt = [(i, (-1.0) ** i) for i in range(200)]
    dw_alt = durbin_watson(
        spark.createDataFrame(alt, ["t", "r"]), "r", "t"
    ).collect()[0]
    assert dw_alt["dw_stat"] == pytest.approx(4.0, abs=0.1)
    # slowly-varying residuals -> DW ~ 0 (strong positive autocorr)
    slow = [(i, 1.0 + i * 1e-4) for i in range(200)]
    dw_slow = durbin_watson(
        spark.createDataFrame(slow, ["t", "r"]), "r", "t"
    ).collect()[0]
    assert dw_slow["dw_stat"] < 0.1


def test_residual_analysis_bundle(spark):
    import numpy as np

    from gofast_spark.stats import residual_analysis

    rng = np.random.default_rng(9)
    rows = [
        (i, float(i), float(i) + float(rng.normal(0, 1))) for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["t", "yhat", "y"])
    out = residual_analysis(df, "y", "yhat", "t").collect()[0]
    assert abs(out["resid_mean"]) < 0.2
    assert out["resid_sd"] == pytest.approx(1.0, abs=0.2)
    assert 1.5 < out["dw_stat"] < 2.5  # iid noise -> DW ~ 2


def test_calibration_curve_perfectly_calibrated(spark):
    from pyspark.sql import functions as F

    from gofast_spark.metrics import calibration_curve

    # deterministic scores, labels drawn to match score per bucket
    # exactly: score s in {0.05,...,0.95}, 20 rows each, pos count = s*20
    rows = []
    for i in range(10):
        s = i / 10 + 0.05
        pos = round(s * 20)
        rows += [(s, 1)] * pos + [(s, 0)] * (20 - pos)
    df = spark.createDataFrame(rows, ["score", "label"])
    out = {r["bin"]: r for r in calibration_curve(df, "score", "label").collect()}
    assert set(out) == set(range(10))
    for b, r in out.items():
        assert r["n"] == 20
        assert abs(r["mean_score"] - (b / 10 + 0.05)) < 1e-6
        assert abs(r["pos_rate"] - round((b / 10 + 0.05) * 20) / 20) < 1e-12
