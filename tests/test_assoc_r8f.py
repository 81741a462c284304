"""Unit tests: gamma/Somers' D, partial correlation, Cliff's delta,
one-way ICC."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import pytest


def test_ordinal_measures_brute_force(spark):
    from gofast_spark.stats.relationships import kendall_tau

    import random

    rng = random.Random(2)
    data = [(rng.randint(0, 4), rng.randint(0, 3)) for _ in range(120)]
    df = spark.createDataFrame(data, "x int, y int")
    r = kendall_tau(df, "x", "y", bins=None).collect()[0]
    C = D = 0
    for (x1, y1), (x2, y2) in itertools.combinations(data, 2):
        s = (x1 - x2) * (y1 - y2)
        C += s > 0
        D += s < 0
    n = len(data)
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in data).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in data).values())
    assert r["gamma"] == pytest.approx((C - D) / (C + D), rel=1e-12)
    assert r["somers_yx"] == pytest.approx((C - D) / (n0 - n1), rel=1e-12)
    assert r["somers_xy"] == pytest.approx((C - D) / (n0 - n2), rel=1e-12)


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def test_partial_corr_matches_formula(spark):
    from gofast_spark.stats.relationships import partial_corr

    import random

    rng = random.Random(9)
    rows = []
    for _ in range(300):
        z = rng.randint(0, 20) * 1.0
        x = z * 2 + rng.randint(0, 10)
        y = z * 3 + rng.randint(0, 10)
        rows.append((x, y, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = partial_corr(df, "x", "y", "z").collect()[0]
    xs = [a for a, _, _ in rows]
    ys = [b for _, b, _ in rows]
    zs = [c for _, _, c in rows]
    r_xy, r_xz, r_yz = (
        _pearson(xs, ys), _pearson(xs, zs), _pearson(ys, zs)
    )
    expect = (r_xy - r_xz * r_yz) / math.sqrt(
        (1 - r_xz**2) * (1 - r_yz**2)
    )
    assert r["r_xy"] == pytest.approx(r_xy, abs=1e-9)
    assert r["partial_corr"] == pytest.approx(expect, abs=1e-9)
    # x,y only correlate through z: the partial should collapse
    assert abs(r["partial_corr"]) < abs(r["r_xy"]) / 2


def test_cliffs_delta_brute_force(spark):
    from gofast_spark.stats.relationships import cliffs_delta

    a = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0]
    b = [1.0, 1.0, 2.0, 4.0, 4.0]
    rows = [(x, "a") for x in a] + [(x, "b") for x in b]
    df = spark.createDataFrame(rows, "v double, g string")
    r = cliffs_delta(df, "v", "g", "a", "b").collect()[0]
    g = sum(x > y for x in a for y in b)
    l_ = sum(x < y for x in a for y in b)
    assert (r["n_greater"], r["n_less"]) == (g, l_)
    assert r["delta"] == pytest.approx((g - l_) / (len(a) * len(b)))
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))


def test_icc_oneway_matches_anova(spark):
    from gofast_spark.stats.inferential import icc_oneway

    groups = {
        "g1": [9.0, 10.0, 11.0, 10.5],
        "g2": [14.0, 15.0, 15.5],
        "g3": [4.0, 5.0, 5.5, 4.5, 5.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = icc_oneway(df, "g", "v").collect()[0]

    all_v = [v for vs in groups.values() for v in vs]
    N, k = len(all_v), len(groups)
    gm = sum(all_v) / N
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values()
    )
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2
        for vs in groups.values()
        for v in vs
    )
    msb, msw = ssb / (k - 1), ssw / (N - k)
    n0 = (N - sum(len(vs) ** 2 for vs in groups.values()) / N) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert r["msb"] == pytest.approx(msb, rel=1e-9)
    assert r["msw"] == pytest.approx(msw, rel=1e-9)
    assert r["icc1"] == pytest.approx(icc, rel=1e-9)
    assert r["icc1"] > 0.9  # well-separated planted groups
    assert (r["k"], r["n"]) == (k, N)
