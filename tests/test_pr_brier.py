"""Unit tests: PR curve / average precision and Brier decomposition."""

from __future__ import annotations

import pytest


def test_pr_curve_brute_force(spark):
    from gofast_spark.metrics import pr_curve

    data = [(float(i % 16), int((i % 16) >= 9 and i % 3 != 0))
            for i in range(160)]
    df = spark.createDataFrame(data, "s double, y int")
    rows = pr_curve(df, "s", "y", lo=0.0, hi=16.0, bins=16).collect()
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    by_thr = {r["threshold"]: r for r in rows}
    for thr, r in by_thr.items():
        tp = sum(s >= thr for s in pos)
        fp = sum(s >= thr for s in neg)
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["precision"] == pytest.approx(tp / (tp + fp))
        assert r["recall"] == pytest.approx(tp / len(pos))
    # AP: manual step sum over descending thresholds
    pts = sorted(by_thr.values(), key=lambda r: -r["threshold"])
    ap = 0.0
    prev_r = 0.0
    for r in pts:
        ap += (r["recall"] - prev_r) * r["precision"]
        prev_r = r["recall"]
    for r in rows:
        assert r["avg_precision"] == pytest.approx(ap, rel=1e-12)
    assert 0.0 < ap <= 1.0


def test_brier_decomposition_exact_within_bin_constant(spark):
    from gofast_spark.metrics import brier_decomposition

    # scores exactly at bin centers -> within-bin forecast variance 0
    # -> brier == reliability - resolution + uncertainty exactly
    rows = []
    for k in range(10):
        p = (k + 0.5) / 10
        n_pos = round(p * 40 * 0.8)  # miscalibrated on purpose
        rows += [(p, 1)] * n_pos + [(p, 0)] * (40 - n_pos)
    df = spark.createDataFrame(rows, "s double, y int")
    r = brier_decomposition(df, "s", "y", bins=10).collect()[0]
    brute = sum((p - y) ** 2 for p, y in rows) / len(rows)
    assert r["brier"] == pytest.approx(brute, abs=1e-9)
    assert r["brier"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"], abs=1e-9
    )
    assert r["n"] == len(rows)
    assert r["reliability"] > 0  # the planted miscalibration shows up


def test_brier_perfect_forecaster(spark):
    from gofast_spark.metrics import brier_decomposition

    rows = [(1.0, 1)] * 30 + [(0.0, 0)] * 70
    df = spark.createDataFrame(rows, "s double, y int")
    r = brier_decomposition(df, "s", "y", bins=10).collect()[0]
    assert r["brier"] == pytest.approx(0.0, abs=1e-12)
    assert r["reliability"] == pytest.approx(0.0, abs=1e-12)
    # resolution equals uncertainty for a perfect forecaster
    assert r["resolution"] == pytest.approx(r["uncertainty"], abs=1e-12)
    assert r["uncertainty"] == pytest.approx(0.3 * 0.7, abs=1e-12)
