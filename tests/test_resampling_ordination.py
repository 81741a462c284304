"""Bootstrap (Poisson), KPSS, and DCA — round-3 reference-surface fills."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- bootstrap
def test_bootstrap_mean_distribution(spark):
    from gofast_spark.stats import bootstrap

    # 2000 values, mean 10, sd 2 -> se of mean ~ 0.045
    import numpy as np

    rng = np.random.default_rng(7)
    vals = (rng.normal(10.0, 2.0, 2000)).tolist()
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    reps = bootstrap(df, "x", n=100, statistic="mean", seed=11).collect()
    assert len(reps) == 100
    stats = [r["stat"] for r in reps]
    true_mean = sum(vals) / len(vals)
    boot_mean = sum(stats) / len(stats)
    boot_sd = math.sqrt(
        sum((s - boot_mean) ** 2 for s in stats) / (len(stats) - 1)
    )
    se = 2.0 / math.sqrt(2000)
    assert abs(boot_mean - true_mean) < 4 * se
    # Poisson-bootstrap sd of the mean tracks the classical se
    assert 0.5 * se < boot_sd < 2.0 * se


def test_bootstrap_deterministic_and_sum(spark):
    from gofast_spark.stats import bootstrap

    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    a = sorted(r["stat"] for r in bootstrap(df, "x", n=20, seed=3).collect())
    b = sorted(r["stat"] for r in bootstrap(df, "x", n=20, seed=3).collect())
    assert a == b
    s = bootstrap(df, "x", n=10, statistic="sum", seed=3).collect()
    # resampled sums scatter around the true sum 4950
    assert all(2000 < r["stat"] < 9000 for r in s)


def test_bootstrap_ci_covers_mean(spark):
    from gofast_spark.stats import bootstrap_ci

    df = spark.createDataFrame([(float(i % 50),) for i in range(1000)], ["x"])
    lo, hi = bootstrap_ci(df, "x", n=100, ci=0.95, seed=5)
    true = sum(i % 50 for i in range(1000)) / 1000
    assert lo < true < hi
    assert hi - lo < 5.0  # tight at n=1000


# --------------------------------------------------------------------- kpss
def _series_df(spark, values, name="s"):
    return spark.createDataFrame(
        [(name, i, float(v)) for i, v in enumerate(values)],
        ["series", "t", "x"],
    )


def test_kpss_stationary_vs_random_walk(spark):
    import numpy as np

    from gofast_spark.ts import kpss_test

    rng = np.random.default_rng(42)
    noise = rng.normal(0, 1, 400)
    walk = np.cumsum(rng.normal(0, 1, 400))
    df = _series_df(spark, noise, "noise").union(_series_df(spark, walk, "walk"))
    out = {r["series"]: r for r in kpss_test(df, "series", "t", "x").collect()}
    # white noise: fail to reject stationarity (p at the 0.10 clamp)
    assert out["noise"]["kpss_stat"] < 0.463
    assert out["noise"]["p_value"] > 0.05
    # random walk: strongly reject
    assert out["walk"]["kpss_stat"] > 0.739
    assert out["walk"]["p_value"] == pytest.approx(0.01)


def test_kpss_trend_regression(spark):
    import numpy as np

    from gofast_spark.ts import kpss_test

    rng = np.random.default_rng(1)
    t = np.arange(300.0)
    trended = 0.5 * t + rng.normal(0, 1, 300)
    df = _series_df(spark, trended)
    # level test rejects a trending series...
    level = kpss_test(df, "series", "t", "x", regression="c").collect()[0]
    assert level["p_value"] == pytest.approx(0.01)
    # ...the trend-stationarity test does not
    trend = kpss_test(df, "series", "t", "x", regression="ct").collect()[0]
    assert trend["p_value"] > 0.05


def test_kpss_known_value(spark):
    """Fixed tiny series; expected stat from the definition computed by
    hand (partial sums [2,1,-1,-3,0... ] etc.) — guards the formula."""
    from gofast_spark.ts import kpss_test

    vals = [3.0, 0.0, -1.0, -1.0, 4.0, 1.0, -2.0, 0.0]  # mean = 0.5
    out = kpss_test(
        _series_df(spark, vals), "series", "t", "x", nlags=0
    ).collect()[0]
    # e = x - 0.5; S = cumsum(e) = [2.5, 2.0, 0.5, -1.0, 2.5, 3.0, 0.5, 0.0]
    # eta = sum(S^2)/64 = 27.0/64; s2 = sum(e^2)/8 = 30.0/8
    assert out["kpss_stat"] == pytest.approx((27.0 / 64) / (30.0 / 8))
    assert out["n"] == 8


# ---------------------------------------------------------------------- dca
def test_dca_orders_sites_along_gradient(spark):
    """Band-diagonal abundance table: species k peaks at site k.  CA axis 1
    must recover the gradient ordering; detrending must shrink the arch
    (axis-2 variance)."""
    import numpy as np

    from gofast_spark.stats import dca_analysis

    n_sites, n_species = 30, 10
    rows = []
    for i in range(n_sites):
        pos = i / (n_sites - 1) * (n_species - 1)
        for j in range(n_species):
            ab = int(round(20 * math.exp(-((pos - j) ** 2) / 2.0)))
            if ab > 0:
                rows.append((f"site{i:02d}", f"sp{j}", ab))
    df = spark.createDataFrame(rows, ["site", "species", "abundance"])
    out = dca_analysis(
        df, "site", "species", value_col="abundance", segments=6
    )
    pdf = out.toPandas().sort_values("site").reset_index(drop=True)
    # axis1 monotone (up to sign) in the site gradient: |spearman| ~ 1
    ranks = pdf["axis1"].rank().to_numpy()
    gradient = np.arange(len(pdf)) + 1.0
    rho = np.corrcoef(ranks, gradient)[0, 1]
    assert abs(rho) > 0.95, rho
    # detrending removed arch variance
    assert pdf["axis2"].var() <= pdf["axis2_raw"].var() + 1e-12


def test_dca_counts_mode_and_no_detrend(spark):
    from gofast_spark.stats import dca_analysis

    rows = [("a", "x"), ("a", "y"), ("b", "y"), ("b", "z"), ("c", "z")]
    df = spark.createDataFrame(rows, ["site", "species"])
    out = dca_analysis(df, "site", "species", detrend=False)
    assert sorted(out.columns) == ["axis1", "axis2", "site"]
    assert out.count() == 3
