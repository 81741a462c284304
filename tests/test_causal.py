"""ipw_ate: recovers a planted effect under confounded assignment."""

from __future__ import annotations

import numpy as np


def test_ipw_recovers_planted_effect(spark):
    from gofast_spark.stats.causal import ipw_ate

    rng = np.random.RandomState(11)
    n = 4000
    x = rng.uniform(-2, 2, size=n)
    # confounded assignment: treatment more likely at high x
    pt = 1.0 / (1.0 + np.exp(-(0.3 + 1.2 * x)))
    t = (rng.uniform(size=n) < pt).astype(int)
    # outcome depends on x AND a true effect of 2.0
    y = 1.0 + 0.8 * x + 2.0 * t + rng.normal(0, 0.3, size=n)
    df = spark.createDataFrame(
        [(float(t[i]), float(y[i]), float(x[i])) for i in range(n)],
        ["t", "y", "x"],
    )
    row = ipw_ate(df, "t", "y", ["x"], n_iter=5, solver="cramer").collect()[0]
    naive = float(y[t == 1].mean() - y[t == 0].mean())
    assert abs(naive - 2.0) > 0.5  # confounding biases the naive diff
    assert abs(row["ate"] - 2.0) < 0.25, row["ate"]
    assert row["n_treated"] + row["n_control"] == n


def test_ipw_coef_round_changes_nothing_material(spark):
    from gofast_spark.stats.causal import ipw_ate

    rows = [
        (float(i % 2), float(i % 3 + (i % 2)), float((i % 7) / 3.0))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["t", "y", "x"])
    a = ipw_ate(df, "t", "y", ["x"]).collect()[0]
    b = ipw_ate(df, "t", "y", ["x"], coef_round=6).collect()[0]
    assert abs(a["ate"] - b["ate"]) < 1e-4


def test_aipw_recovers_planted_effect(spark):
    from gofast_spark.stats.causal import aipw_ate

    rng = np.random.RandomState(5)
    n = 4000
    x = rng.uniform(-2, 2, size=n)
    pt = 1.0 / (1.0 + np.exp(-(0.2 + 1.0 * x)))
    t = (rng.uniform(size=n) < pt).astype(int)
    y = 0.5 + 1.1 * x + 1.5 * t + rng.normal(0, 0.3, size=n)
    df = spark.createDataFrame(
        [(float(t[i]), float(y[i]), float(x[i])) for i in range(n)],
        ["t", "y", "x"],
    )
    row = aipw_ate(df, "t", "y", ["x"], n_iter=5).collect()[0]
    assert abs(row["ate_aipw"] - 1.5) < 0.1, row["ate_aipw"]
    assert row["n_treated"] + row["n_control"] == n


def test_aipw_double_robustness_vs_ipw_under_bad_propensity(spark):
    """With only ONE Newton step the propensity model is badly
    under-fitted; the outcome model rescues AIPW but not plain IPW."""
    from gofast_spark.stats.causal import aipw_ate, ipw_ate

    rng = np.random.RandomState(9)
    n = 6000
    x = rng.uniform(-2, 2, size=n)
    pt = 1.0 / (1.0 + np.exp(-(0.4 + 1.5 * x)))
    t = (rng.uniform(size=n) < pt).astype(int)
    y = 2.0 * x + 1.0 * t + rng.normal(0, 0.2, size=n)
    df = spark.createDataFrame(
        [(float(t[i]), float(y[i]), float(x[i])) for i in range(n)],
        ["t", "y", "x"],
    )
    aipw = aipw_ate(df, "t", "y", ["x"], n_iter=1).collect()[0]["ate_aipw"]
    ipw = ipw_ate(df, "t", "y", ["x"], n_iter=1).collect()[0]["ate"]
    assert abs(aipw - 1.0) < abs(ipw - 1.0)
    assert abs(aipw - 1.0) < 0.15
