"""Unit tests: log-rank test, EWMA, Cohen's kappa, gains table."""

from __future__ import annotations

import pytest


def test_logrank_matches_hand_computation(spark):
    from gofast_spark.stats.survival import logrank_test

    # groups with clearly different hazards
    rows = (
        [(t, 1, "a") for t in (1, 2, 2, 3, 4)]
        + [(5, 0, "a")]
        + [(t, 1, "b") for t in (4, 5, 6, 6, 7)]
        + [(8, 0, "b")]
    )
    df = spark.createDataFrame(rows, "d int, e int, g string")
    r = logrank_test(df, "d", "e", "g", "a", "b", bins=None).collect()[0]

    # pure-python replay
    n_a, n_b = 6, 6
    per_t = {}
    for d, e, g in rows:
        m = per_t.setdefault(d, [0, 0, 0, 0])  # m_a, m_b, d_a, d_b
        m[0 if g == "a" else 1] += 1
        m[2 if g == "a" else 3] += e
    ome = var = 0.0
    ra, rb = n_a, n_b
    for t in sorted(per_t):
        m_a, m_b, d_a, d_b = per_t[t]
        d = d_a + d_b
        n = ra + rb
        if d > 0:
            e_a = d * ra / n
            ome += d_a - e_a
            if n > 1:
                var += d * (ra / n) * (rb / n) * (n - d) / (n - 1)
        ra -= m_a
        rb -= m_b
    assert r["o_minus_e"] == pytest.approx(ome, abs=1e-12)
    assert r["var"] == pytest.approx(var, abs=1e-12)
    assert r["chi2"] == pytest.approx(ome * ome / var, rel=1e-12)
    assert (r["n_a"], r["n_b"]) == (6, 6)
    assert r["chi2"] > 3.84  # the planted difference is significant


def test_logrank_null_is_small(spark):
    from gofast_spark.stats.survival import logrank_test

    rows = [(t, 1, g) for t in range(1, 21) for g in ("a", "b")]
    df = spark.createDataFrame(rows, "d int, e int, g string")
    r = logrank_test(df, "d", "e", "g", "a", "b", bins=None).collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)


def test_ewma_matches_recursion(spark):
    from gofast_spark.ts.engineering import ewma

    xs = [4.0, 7.0, 1.0, 9.0, 3.0, 8.0, 2.0]
    for alpha in (0.5, 0.25, 0.3):
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "t int, x double"
        )
        got = [
            r["ewma"]
            for r in ewma(df, "t", "x", alpha=alpha).orderBy("t").collect()
        ]
        s = xs[0]
        expect = [s]
        for x in xs[1:]:
            s = alpha * x + (1 - alpha) * s
            expect.append(s)
        assert got == pytest.approx(expect, rel=1e-9)


def test_ewma_partitioned_series_independent(spark):
    from gofast_spark.ts.engineering import ewma

    df = spark.createDataFrame(
        [("k1", 1, 10.0), ("k1", 2, 20.0), ("k2", 1, 100.0), ("k2", 2, 0.0)],
        "k string, t int, x double",
    )
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, "t", "x", alpha=0.5, partition_by="k").collect()
    }
    assert got[("k1", 1)] == 10.0 and got[("k1", 2)] == 15.0
    assert got[("k2", 1)] == 100.0 and got[("k2", 2)] == 50.0


def test_ewma_alpha_one_is_identity(spark):
    from gofast_spark.ts.engineering import ewma

    df = spark.createDataFrame([(1, 3.0), (2, 5.0)], "t int, x double")
    got = [r["ewma"] for r in ewma(df, "t", "x", alpha=1.0).orderBy("t").collect()]
    assert got == [3.0, 5.0]


def test_cohen_kappa_known_value(spark):
    from gofast_spark.metrics import cohen_kappa

    # classic 2x2 example: po=0.7, pe=0.5 -> kappa=0.4
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    assert r["po"] == pytest.approx(po)
    assert r["pe"] == pytest.approx(pe)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe))
    assert r["n"] == 50


def test_cohen_kappa_perfect_and_random(spark):
    from gofast_spark.metrics import cohen_kappa

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")] * 4, "a string, b string"
    )
    assert cohen_kappa(perfect, "a", "b").collect()[0]["kappa"] == pytest.approx(1.0)


def test_gains_table_exact(spark):
    from gofast_spark.metrics import gains_table

    # scores 100..1: top half positive
    rows = [(i, float(100 - i), int(i <= 50)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "k int, s double, y int")
    got = {r["bucket"]: r for r in gains_table(df, "s", "y", "k", n_buckets=10).collect()}
    assert len(got) == 10
    for b in range(1, 6):
        assert got[b]["pos"] == 10 and got[b]["response_rate"] == 1.0
        assert got[b]["lift"] == pytest.approx(2.0)
    for b in range(6, 11):
        assert got[b]["pos"] == 0
    assert got[5]["capture"] == pytest.approx(1.0)
    assert got[10]["cum_lift"] == pytest.approx(1.0)


def test_gains_table_sketch_mode_close_to_exact(spark):
    from gofast_spark.metrics import gains_table

    rows = [(i, float(i % 97), int((i % 97) >= 60)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k int, s double, y int")
    exact = gains_table(df, "s", "y", "k", mode="exact").collect()
    sketch = gains_table(df, "s", "y", "k", mode="sketch").collect()
    tot_exact = sum(r["pos"] for r in exact)
    tot_sketch = sum(r["pos"] for r in sketch)
    assert tot_exact == tot_sketch  # no rows lost
    cap_e = {r["bucket"]: r["capture"] for r in exact}
    cap_s = {r["bucket"]: r["capture"] for r in sketch}
    for b in cap_e:
        if b in cap_s:
            assert abs(cap_e[b] - cap_s[b]) < 0.15
