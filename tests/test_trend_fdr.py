"""Unit tests: Mann-Kendall/Sen's slope and Benjamini-Hochberg FDR."""

from __future__ import annotations

import itertools

import pytest


def _mk_reference(xs):
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i, j in itertools.combinations(range(n), 2)
    )
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i, j in itertools.combinations(range(n), 2)
    )
    m = len(slopes)
    sen = (
        slopes[m // 2]
        if m % 2
        else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    )
    ties = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1) / var_s**0.5
    elif s < 0:
        z = (s + 1) / var_s**0.5
    else:
        z = 0.0
    return s, var_s, z, sen


@pytest.mark.parametrize(
    "xs",
    [
        [3.0, 5.0, 4.0, 7.0, 6.0, 9.0, 8.0, 11.0],  # upward
        [9.0, 7.0, 8.0, 5.0, 6.0, 3.0],  # downward
        [2.0, 2.0, 5.0, 5.0, 3.0, 7.0, 2.0],  # ties
    ],
)
def test_mann_kendall_matches_reference(spark, xs):
    from gofast_spark.ts.engineering import mann_kendall

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t int, x double"
    )
    r = mann_kendall(df, "t", "x").collect()[0]
    s, var_s, z, sen = _mk_reference(xs)
    assert r["s"] == s and r["n"] == len(xs)
    assert r["var_s"] == pytest.approx(var_s, rel=1e-12)
    assert r["z"] == pytest.approx(z, rel=1e-12)
    assert r["sen_slope"] == pytest.approx(sen, rel=1e-9)


def test_fdr_bh_matches_statsmodels_convention(spark):
    from gofast_spark.stats.multiple import fdr_bh

    # worked example (Benjamini & Hochberg 1995 style): m=5
    ps = [0.01, 0.04, 0.03, 0.005, 0.2]
    df = spark.createDataFrame(
        [(f"h{i}", p) for i, p in enumerate(ps)], "h string, p double"
    )
    got = {r["h"]: r for r in fdr_bh(df, "p", tiebreak_cols=["h"]).collect()}

    # reference BH q-values
    order = sorted(range(5), key=lambda i: (ps[i], f"h{i}"))
    m = 5
    q = [0.0] * 5
    running = 1.0
    for rank_from_end, i in enumerate(reversed(order)):
        rank = m - rank_from_end
        running = min(running, ps[i] * m / rank)
        q[i] = running
    for i in range(5):
        assert got[f"h{i}"]["q_value"] == pytest.approx(q[i], rel=1e-12)
    # step-up at alpha=0.05: h3 (.005), h0 (.01), h2 (.03), h1 (.04) all
    # have q <= 0.05 (q for rank4 = .04*5/4 = .05), h4 not
    assert got["h3"]["reject"] == 1 and got["h0"]["reject"] == 1
    assert got["h2"]["reject"] == 1 and got["h1"]["reject"] == 1
    assert got["h4"]["reject"] == 0


def test_fdr_bh_monotone_in_rank(spark):
    from gofast_spark.stats.multiple import fdr_bh

    import random

    rng = random.Random(5)
    ps = [round(rng.random(), 6) for _ in range(40)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "i int, p double"
    )
    rows = fdr_bh(df, "p", tiebreak_cols=["i"]).orderBy("rank").collect()
    qs = [r["q_value"] for r in rows]
    assert all(a <= b + 1e-15 for a, b in zip(qs, qs[1:]))
    assert all(0.0 <= x <= 1.0 for x in qs)
    assert all(r["q_value"] >= r["p"] - 1e-15 for r in rows)
