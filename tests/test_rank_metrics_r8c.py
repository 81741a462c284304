"""Unit tests: Kendall tau-b, AUC rank identity, two-proportion test."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import pytest


def test_kendall_tau_brute_force_with_ties(spark):
    from gofast_spark.stats.relationships import kendall_tau

    import random

    rng = random.Random(11)
    data = [(rng.randint(0, 7), rng.randint(0, 4)) for _ in range(150)]
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
    assert (r["concordant"], r["discordant"], r["n"]) == (C, D, n)
    assert r["tau_b"] == pytest.approx(
        (C - D) / math.sqrt((n0 - n1) * (n0 - n2)), rel=1e-12
    )


def test_kendall_tau_perfect_orderings(spark):
    from gofast_spark.stats.relationships import kendall_tau

    up = spark.createDataFrame(
        [(i, 2 * i + 1) for i in range(20)], "x int, y int"
    )
    assert kendall_tau(up, "x", "y", bins=None).collect()[0][
        "tau_b"
    ] == pytest.approx(1.0)
    down = spark.createDataFrame(
        [(i, -3 * i) for i in range(20)], "x int, y int"
    )
    assert kendall_tau(down, "x", "y", bins=None).collect()[0][
        "tau_b"
    ] == pytest.approx(-1.0)


def test_auc_matches_pair_counting(spark):
    from gofast_spark.metrics import auc_score

    import random

    rng = random.Random(7)
    data = [
        (rng.choice([1.0, 2.0, 3.0, 4.0, 5.0]) + (0.8 if rng.random() < 0.4 else 0.0), 0)
        for _ in range(80)
    ] + [
        (rng.choice([2.0, 3.0, 4.0, 5.0, 6.0]), 1) for _ in range(60)
    ]
    df = spark.createDataFrame(data, "s double, y int")
    r = auc_score(df, "s", "y").collect()[0]
    pos = [s for s, y in data if y == 1]
    neg = [s for s, y in data if y == 0]
    wins = sum(
        (p > q) + 0.5 * (p == q) for p in pos for q in neg
    )
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert r["auc"] == pytest.approx(wins / (len(pos) * len(neg)), rel=1e-12)


def test_auc_perfect_separation(spark):
    from gofast_spark.metrics import auc_score

    df = spark.createDataFrame(
        [(float(i), int(i >= 50)) for i in range(100)], "s double, y int"
    )
    assert auc_score(df, "s", "y").collect()[0]["auc"] == pytest.approx(1.0)


def test_two_proportion_known_values(spark):
    from gofast_spark.stats.inferential import two_proportion_test

    rows = [("a", 1)] * 40 + [("a", 0)] * 60 + [("b", 1)] * 25 + [("b", 0)] * 75
    df = spark.createDataFrame(rows, "g string, s int")
    r = two_proportion_test(df, "g", "s", "a", "b").collect()[0]
    pa, pb, na, nb = 0.4, 0.25, 100, 100
    pool = (40 + 25) / 200
    z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    assert r["p_a"] == pytest.approx(pa) and r["p_b"] == pytest.approx(pb)
    assert r["z"] == pytest.approx(z, rel=1e-12)
    assert r["p_value"] < 0.05  # 40% vs 25% at n=100 is significant
    # Wilson intervals contain the point estimates and sit inside [0,1]
    assert 0.0 <= r["a_lo"] < pa < r["a_hi"] <= 1.0
    assert 0.0 <= r["b_lo"] < pb < r["b_hi"] <= 1.0


def test_two_proportion_null(spark):
    from gofast_spark.stats.inferential import two_proportion_test

    rows = [("a", i % 5 == 0) for i in range(200)] + [
        ("b", i % 5 == 0) for i in range(200)
    ]
    df = spark.createDataFrame(
        [(g, int(s)) for g, s in rows], "g string, s int"
    )
    r = two_proportion_test(df, "g", "s", "a", "b").collect()[0]
    assert r["z"] == pytest.approx(0.0, abs=1e-12)
    assert r["p_value"] == pytest.approx(1.0, abs=1e-6)
