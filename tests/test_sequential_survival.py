"""Unit tests: Nelson-Aalen cumulative hazard and the mSPRT
always-valid curve (stats/sequential.py) vs pure-Python references."""

from __future__ import annotations

import math

import pytest


def _na_reference(pairs):
    """(duration, event) pairs -> {duration: (n_risk, d, H, varH)}."""
    times = sorted({d for d, _ in pairs})
    n = len(pairs)
    out = {}
    h = vh = 0.0
    seen = 0
    for t in times:
        at_t = [e for d, e in pairs if d == t]
        n_risk = n - seen
        d_t = sum(at_t)
        h += d_t / n_risk
        vh += d_t / n_risk**2
        out[t] = (n_risk, d_t, h, vh)
        seen += len(at_t)
    return out


def test_nelson_aalen_matches_reference(spark):
    from gofast_spark.stats.survival import nelson_aalen

    pairs = [(1, 1), (1, 0), (2, 1), (3, 0), (3, 1), (3, 1), (5, 0), (6, 1)]
    df = spark.createDataFrame(pairs, "d int, e int")
    got = {
        r["duration"]: r
        for r in nelson_aalen(df, "d", "e", bins=None).collect()
    }
    ref = _na_reference(pairs)
    for t, (n_risk, d_t, h, vh) in ref.items():
        if d_t == 0:
            assert t not in got
            continue
        r = got[t]
        assert r["n_risk"] == n_risk and r["n_events"] == d_t
        assert r["cum_hazard"] == pytest.approx(h, abs=1e-12)
        assert r["var_hazard"] == pytest.approx(vh, abs=1e-12)


def test_nelson_aalen_keep_censor_times(spark):
    from gofast_spark.stats.survival import nelson_aalen

    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1)], "d int, e int"
    )
    rows = nelson_aalen(df, "d", "e", keep_censor_times=True, bins=None)
    assert [r["duration"] for r in rows.collect()] == [1, 2, 3]


def _msprt_reference(rows, tau2):
    """rows: (day, variant, value). Returns {day: (theta, lam, p)}."""
    days = sorted({d for d, _, _ in rows})
    out = {}
    best_lam = 0.0
    for cut in days:
        a = [v for d, g, v in rows if d <= cut and g == "control"]
        b = [v for d, g, v in rows if d <= cut and g == "treatment"]
        if len(a) < 2 or len(b) < 2:
            continue
        q = lambda xs: [math.floor(x * 1e3 + 0.5) / 1e3 for x in xs]
        a, b = q(a), q(b)
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        theta = mb - ma
        v = vb / len(b) + va / len(a)
        lam = math.sqrt(v / (v + tau2)) * math.exp(
            theta * theta * tau2 / (2 * v * (v + tau2))
        )
        best_lam = max(best_lam, lam)
        out[cut] = (theta, lam, min(1.0, 1.0 / best_lam))
    return out


def test_msprt_curve_matches_reference(spark):
    from gofast_spark.stats.sequential import msprt_curve

    rows = []
    rng_vals = [3.25, 4.5, 2.0, 5.75, 3.0, 6.25, 4.0, 2.5, 7.0, 5.0,
                3.5, 4.25, 6.0, 2.75, 5.5, 4.75]
    i = 0
    for day in range(1, 5):
        for variant in ("control", "treatment"):
            for _ in range(2):
                bump = 2.0 if variant == "treatment" else 0.0
                rows.append((day, variant, rng_vals[i] + bump))
                i += 1
    df = spark.createDataFrame(
        [
            (f"2024-01-{d:02d} 12:00:00", g, v)
            for d, g, v in rows
        ],
        "ts string, variant string, value double",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "variant", "value")
    got = {
        str(r["day"]): r
        for r in msprt_curve(
            df, "ts", "variant", "value",
            control="control", treatment="treatment", tau2=0.5,
        ).collect()
    }
    ref = _msprt_reference(rows, 0.5)
    assert len(got) == len(ref)
    for day, (theta, lam, p) in ref.items():
        r = got[f"2024-01-{day:02d}"]
        assert r["theta"] == pytest.approx(theta, abs=1e-9)
        assert r["likelihood_ratio"] == pytest.approx(lam, rel=1e-9)
        assert r["p_value"] == pytest.approx(p, rel=1e-9)


def test_msprt_p_monotone_and_valid_under_null(spark, sf_small):
    """Under a user-hash null split the always-valid p stays high and is
    monotone non-increasing day over day."""
    from pyspark.sql import functions as F

    from gofast_spark.stats.sequential import msprt_curve

    e = (
        spark.read.parquet(f"{sf_small}/events.parquet")
        .where(F.col("ts").isNotNull())
        .withColumn(
            "variant",
            F.when(F.col("user_id") % 2 == 1, "treatment").otherwise(
                "control"
            ),
        )
    )
    rows = msprt_curve(
        e, "ts", "variant", "value",
        control="control", treatment="treatment", tau2=1.0,
    ).orderBy("day").collect()
    assert len(rows) >= 20
    ps = [r["p_value"] for r in rows]
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    assert ps[-1] > 0.05  # null split: should not reject
