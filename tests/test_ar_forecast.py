"""ar_forecast vs a pure-Python Yule-Walker + recursion reference."""

from __future__ import annotations

import math


def _ref_forecast(ys, p, horizon):
    n = len(ys)
    mu = sum(ys) / n

    def corr_lag(k):
        a = ys[k:]
        b = ys[:-k]
        ma = sum(a) / len(a)
        mb = sum(b) / len(b)
        num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
        da = math.sqrt(sum((x - ma) ** 2 for x in a))
        db = math.sqrt(sum((y - mb) ** 2 for y in b))
        return num / (da * db)

    rho = [1.0] + [corr_lag(k) for k in range(1, p + 1)]
    # Durbin-Levinson
    phi = {1: {1: rho[1]}}
    for k in range(2, p + 1):
        prev = phi[k - 1]
        num = rho[k] - sum(prev[j] * rho[k - j] for j in range(1, k))
        den = 1.0 - sum(prev[j] * rho[j] for j in range(1, k))
        pkk = num / den
        phi[k] = {j: prev[j] - pkk * prev[k - j] for j in range(1, k)}
        phi[k][k] = pkk
    coef = [phi[p][j] for j in range(1, p + 1)]
    devs = [ys[-1] - mu, ys[-2] - mu, ys[-3] - mu][:p]
    out = []
    for _ in range(horizon):
        d = sum(c * e for c, e in zip(coef, devs))
        out.append(mu + d)
        devs = [d] + devs[:-1]
    return out


def test_ar_forecast_matches_reference(spark):
    from gofast_spark.ts.engineering import ar_forecast

    ys = [float(10 + 3 * math.sin(i / 2.0) + (i % 5)) for i in range(40)]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], ["t", "y"]
    )
    got = {
        r["h"]: r["forecast"]
        for r in ar_forecast(df, "y", "t", p=3, horizon=5).collect()
    }
    want = _ref_forecast(ys, 3, 5)
    assert set(got) == {1, 2, 3, 4, 5}
    for h in range(1, 6):
        assert abs(got[h] - want[h - 1]) < 1e-6, (h, got[h], want[h - 1])


def test_ar1_forecast_geometric_decay_to_mean(spark):
    from gofast_spark.ts.engineering import ar_forecast

    # AR(1) with |phi| < 1: deviations shrink geometrically toward mu
    ys = [float(v) for v in [12, 8, 11, 9, 12, 8, 11, 9, 12, 8, 11, 9]]
    df = spark.createDataFrame([(i, y) for i, y in enumerate(ys)], ["t", "y"])
    fc = {
        r["h"]: r["forecast"]
        for r in ar_forecast(df, "y", "t", p=1, horizon=4).collect()
    }
    mu = sum(ys) / len(ys)
    gaps = [abs(fc[h] - mu) for h in range(1, 5)]
    assert gaps == sorted(gaps, reverse=True)
