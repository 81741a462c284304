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
