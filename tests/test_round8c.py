"""Unit tests for the round-8c batch: Ljung-Box, Bartlett, Theta."""

from __future__ import annotations

import math

import pytest


def test_ljung_box_matches_reference(spark):
    from gofast_spark.ts.engineering import ljung_box

    ys = [3.0, 1.0, 4.0, 1.5, 5.0, 9.0, 2.0, 6.0, 5.0, 3.5, 8.0, 7.0]
    df = spark.createDataFrame(list(enumerate(ys)), ["t", "y"])
    row = ljung_box(df, "y", "t", max_lag=3).collect()[0]
    n = len(ys)

    def corr(a, b):
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
        da = math.sqrt(sum((x - ma) ** 2 for x in a))
        db = math.sqrt(sum((y - mb) ** 2 for y in b))
        return num / (da * db)

    q = 0.0
    for k in (1, 2, 3):
        r = corr(ys[k:], ys[:-k])
        q += r * r / (n - k)
    q *= n * (n + 2)
    assert row["n"] == n and row["dof"] == 3
    assert abs(row["q_stat"] - q) < 1e-9


def test_bartlett_matches_reference(spark):
    from gofast_spark.stats.inferential import bartlett_test

    groups = {
        "a": [8.88, 9.12, 9.04, 8.98, 9.0, 9.08, 9.01, 8.85, 9.06, 8.99],
        "b": [8.88, 8.95, 9.29, 9.44, 9.15, 9.58, 8.36, 9.18, 8.67, 9.05],
        "c": [8.95, 9.12, 8.95, 8.85, 9.03, 8.84, 9.07, 8.98, 8.86, 8.98],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = bartlett_test(df, "v", "g").collect()[0]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    k = len(groups)
    ns = [len(v) for v in groups.values()]
    nn = sum(ns) - k
    sp = sum((n - 1) * var(v) for n, v in zip(ns, groups.values())) / nn
    num = nn * math.log(sp) - sum(
        (n - 1) * math.log(var(v)) for n, v in zip(ns, groups.values())
    )
    c = 1 + (sum(1 / (n - 1) for n in ns) - 1 / nn) / (3 * (k - 1))
    assert got["n_groups"] == k and got["dof"] == k - 1
    assert got["bartlett_stat"] == pytest.approx(num / c, abs=1e-4)


def test_theta_matches_recursion(spark):
    from gofast_spark.ts.engineering import theta_forecast

    ys = [10.0, 12.0, 11.0, 14.0, 13.5, 16.0, 15.0, 18.0]
    df = spark.createDataFrame(list(enumerate(ys)), ["t", "y"])
    got = {r["h"]: r["forecast"] for r in
           theta_forecast(df, "t", "y", alpha=0.5, horizon=3).collect()}
    # SES recursion
    lvl = ys[0]
    for y in ys[1:]:
        lvl = 0.5 * y + 0.5 * lvl
    # OLS slope
    n = len(ys)
    ts = list(range(n))
    mt, my = sum(ts) / n, sum(ys) / n
    slope = sum((t - mt) * (y - my) for t, y in zip(ts, ys)) / sum(
        (t - mt) ** 2 for t in ts
    )
    for h in (1, 2, 3):
        drift = h - 1 + 2.0 - 0.5 ** n * 2.0
        assert got[h] == pytest.approx(lvl + slope / 2 * drift, abs=1e-9)
    assert len(got) == 3


def test_did_estimator_small(spark):
    from gofast_spark.stats.causal import did_estimator
    import pyspark.sql.functions as F

    rows = [
        # (treated, post, y)
        (1, 0, 10.0), (1, 0, 12.0),   # T pre  mean 11
        (1, 1, 20.0), (1, 1, 26.0),   # T post mean 23
        (0, 0, 5.0), (0, 0, 7.0),     # C pre  mean 6
        (0, 1, 9.0), (0, 1, 11.0),    # C post mean 10
    ]
    df = spark.createDataFrame(rows, ["t", "p", "y"])
    got = did_estimator(
        df, "y", F.col("t") == 1, F.col("p") == 1
    ).collect()[0]
    assert got["mean_t_pre"] == pytest.approx(11.0)
    assert got["mean_c_post"] == pytest.approx(10.0)
    # (23 - 11) - (10 - 6) = 8
    assert got["did"] == pytest.approx(8.0, abs=1e-9)
    assert got["n_t_post"] == 2


def test_rdd_recovers_known_discontinuity(spark):
    from gofast_spark.stats.causal import rdd_local_linear

    # y = 2 + 0.5*(x-5) left of 5; y = 7 + 1.5*(x-5) right: tau = 5
    rows = []
    for i in range(40):
        x = i * 0.25  # 0 .. 9.75
        if x < 5:
            y = 2.0 + 0.5 * (x - 5.0)
        else:
            y = 7.0 + 1.5 * (x - 5.0)
        rows.append((x, y))
    df = spark.createDataFrame(rows, ["x", "y"])
    got = rdd_local_linear(df, "x", "y", cutoff=5.0, bandwidth=3.0) \
        .collect()[0]
    assert got["tau"] == pytest.approx(5.0, abs=1e-4)
    assert got["b_left"] == pytest.approx(0.5, abs=1e-4)
    assert got["b_right"] == pytest.approx(1.5, abs=1e-4)
    assert got["n_left"] > 0 and got["n_right"] > 0
