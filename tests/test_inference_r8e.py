"""Unit tests: Cochran-Armitage trend, G-test, Neyman sampling."""

from __future__ import annotations

import math

import pytest


def test_cochran_armitage_matches_hand_formula(spark):
    from gofast_spark.stats.inferential import cochran_armitage_trend

    # dose groups 0,1,2 with rising success rates
    groups = {0: (50, 5), 1: (50, 12), 2: (50, 25)}  # (n_i, r_i)
    rows = []
    for sc, (n_i, r_i) in groups.items():
        rows += [(sc, 1)] * r_i + [(sc, 0)] * (n_i - r_i)
    df = spark.createDataFrame(rows, "sc int, y int")
    r = cochran_armitage_trend(df, "sc", "y").collect()[0]

    n = sum(n_i for n_i, _ in groups.values())
    rr = sum(r_i for _, r_i in groups.values())
    rs = sum(sc * r_i for sc, (_, r_i) in groups.items())
    ns = sum(sc * n_i for sc, (n_i, _) in groups.items())
    nss = sum(sc * sc * n_i for sc, (n_i, _) in groups.items())
    t = rs - rr * ns / n
    p = rr / n
    var = p * (1 - p) * (nss - ns * ns / n)
    z = t / math.sqrt(var)
    assert r["z"] == pytest.approx(z, rel=1e-12)
    assert r["p_value"] < 0.001  # strong planted trend
    assert (r["n"], r["n_groups"]) == (150, 3)


def test_cochran_armitage_null(spark):
    from gofast_spark.stats.inferential import cochran_armitage_trend

    rows = []
    for sc in range(4):
        rows += [(sc, 1)] * 10 + [(sc, 0)] * 30
    df = spark.createDataFrame(rows, "sc int, y int")
    r = cochran_armitage_trend(df, "sc", "y").collect()[0]
    assert r["z"] == pytest.approx(0.0, abs=1e-12)


def test_g_test_matches_hand_formula(spark):
    from gofast_spark.stats.inferential import g_test

    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 15 + [("b", "y")] * 25
    )
    df = spark.createDataFrame(rows, "u string, v string")
    r = g_test(df, "u", "v").collect()[0]
    n = 80
    obs = {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 15, ("b", "y"): 25}
    row_m = {"a": 40, "b": 40}
    col_m = {"x": 45, "y": 35}
    g = 2 * sum(
        o * math.log(o / (row_m[a] * col_m[b] / n))
        for (a, b), o in obs.items()
    )
    assert r["g_stat"] == pytest.approx(g, rel=1e-12)
    assert r["dof"] == 1 and r["n"] == n
    assert r["g_stat"] > 6.63  # significant at 1%


def test_g_test_independent_is_near_zero(spark):
    from gofast_spark.stats.inferential import g_test

    rows = []
    for u in ("a", "b"):
        for v in ("x", "y"):
            rows += [(u, v)] * 25
    df = spark.createDataFrame(rows, "u string, v string")
    r = g_test(df, "u", "v").collect()[0]
    assert r["g_stat"] == pytest.approx(0.0, abs=1e-9)


def test_neyman_sample_allocates_to_noisy_strata(spark):
    from gofast_spark.operators.sampling import neyman_sample

    # stratum 'wide' has 10x the std of 'narrow'; equal sizes
    rows = [(i, "narrow", 100.0 + (i % 5)) for i in range(500)] + [
        (i + 500, "wide", 100.0 + 50.0 * (i % 5)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id bigint, h string, v double")
    s = neyman_sample(df, "h", "v", "id", total=300, seed=1)
    counts = {
        r["h"]: r["cnt"]
        for r in s.groupBy("h").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count(
                "*"
            ).alias("cnt")
        ).collect()
    }
    # expected: wide gets ~10/11 of the budget
    assert counts.get("wide", 0) > 3 * counts.get("narrow", 0)
    total = sum(counts.values())
    assert 150 <= total <= 450  # hash thresholding is approximate


def test_neyman_sample_deterministic(spark):
    from gofast_spark.operators.sampling import neyman_sample

    rows = [(i, "a" if i % 2 else "b", float(i % 17)) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, h string, v double")
    s1 = sorted(
        r["id"]
        for r in neyman_sample(df, "h", "v", "id", total=100, seed=3)
        .select("id")
        .collect()
    )
    s2 = sorted(
        r["id"]
        for r in neyman_sample(
            df.repartition(13), "h", "v", "id", total=100, seed=3
        )
        .select("id")
        .collect()
    )
    assert s1 == s2 and len(s1) > 0
