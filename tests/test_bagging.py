"""Unit tests: bagged stumps (ml/bagging.py) vs a pure-Python
per-replicate refit using the same portable Poisson(1) draws."""

from __future__ import annotations

import hashlib

import pytest


def _uniform(key, replicate, seed):
    h = hashlib.md5(f"{key}_{replicate}_{seed}".encode()).hexdigest()
    return (int(h[:15], 16) % 2**31) / 2**31


def _pois1(u):
    from gofast_spark.stats.resampling import POIS1_CDF

    for k, c in enumerate(POIS1_CDF):
        if u < c:
            return k
    return len(POIS1_CDF)


def _fit_stump_py(rows, lo, hi, bins):
    """rows: (weight, x, y). Returns (threshold, gain, nl, nr, pl, pr)."""
    width = (hi - lo) / bins
    hist = {}
    for w, x, y in rows:
        b = min(max(int((x - lo) // width), 0), bins - 1)
        n, p = hist.get(b, (0, 0))
        hist[b] = (n + w, p + w * y)
    tn = sum(n for n, _ in hist.values())
    tp = sum(p for _, p in hist.values())

    def gini(p, n):
        q = p / n
        return 2.0 * q * (1.0 - q)

    best = None
    for b in sorted(hist):
        nl = sum(n for bb, (n, _) in hist.items() if bb < b)
        pl = sum(p for bb, (_, p) in hist.items() if bb < b)
        if nl == 0 or tn - nl == 0:
            continue
        gain = (
            gini(tp, tn)
            - nl / tn * gini(pl, nl)
            - (tn - nl) / tn * gini(tp - pl, tn - nl)
        )
        thr = lo + b * width
        key = (gain, -thr)
        if best is None or key > best[0]:
            best = (key, (thr, gain, nl, tn - nl, pl, tp - pl))
    return best[1]


def test_bagged_stumps_match_python_refit(spark):
    from gofast_spark.ml.bagging import fit_bagged_stumps

    data = [
        (k, float(10 + 7 * (k % 13)), int(k % 13 >= 7)) for k in range(120)
    ]
    df = spark.createDataFrame(data, "k bigint, x double, y int")
    got = {
        r["replicate"]: r
        for r in fit_bagged_stumps(
            df, "x", "y", "k", lo=0.0, hi=128.0, bins=16,
            n_estimators=3, seed=11,
        ).collect()
    }
    assert len(got) == 3
    for rep in range(3):
        rows = [
            (_pois1(_uniform(k, rep, 11)), x, y) for k, x, y in data
        ]
        thr, gain, nl, nr, pl, pr = _fit_stump_py(rows, 0.0, 128.0, 16)
        r = got[rep]
        assert r["threshold"] == pytest.approx(thr)
        assert r["gain"] == pytest.approx(gain, rel=1e-12)
        assert (r["n_left"], r["n_right"], r["pos_left"], r["pos_right"]) == (
            nl, nr, pl, pr,
        )


def test_bagged_stumps_replicates_vary_but_agree_on_strong_signal(spark):
    """A clean threshold at x=64 must be recovered by every replicate
    even though the resample weights differ across replicates."""
    from gofast_spark.ml.bagging import fit_bagged_stumps

    data = [(k, float(k), int(k >= 64)) for k in range(128)]
    df = spark.createDataFrame(data, "k bigint, x double, y int")
    rows = fit_bagged_stumps(
        df, "x", "y", "k", lo=0.0, hi=128.0, bins=16,
        n_estimators=4, seed=3,
    ).collect()
    assert len(rows) == 4
    assert {r["threshold"] for r in rows} == {64.0}
    weights = {(r["n_left"], r["n_right"]) for r in rows}
    assert len(weights) > 1  # resamples actually differ


def test_bagged_stumps_validation(spark):
    from gofast_spark.ml.bagging import fit_bagged_stumps

    df = spark.createDataFrame([(1, 1.0, 0)], "k bigint, x double, y int")
    with pytest.raises(ValueError):
        fit_bagged_stumps(df, "x", "y", "k", lo=0.0, hi=1.0, bins=1)
    with pytest.raises(ValueError):
        fit_bagged_stumps(df, "x", "y", "k", lo=1.0, hi=1.0)
    with pytest.raises(ValueError):
        fit_bagged_stumps(df, "x", "y", "k", lo=0.0, hi=1.0, n_estimators=0)
