"""cusum vs the textbook recursion."""

from __future__ import annotations


def _cusum_ref(xs, target, k):
    cp = cn = 0.0
    out = []
    for x in xs:
        cp = max(0.0, cp + (x - target - k))
        cn = max(0.0, cn + (target - x - k))
        out.append((cp, cn))
    return out


def test_cusum_fixed_target_matches_recursion(spark):
    from gofast_spark.ts.changepoint import cusum

    xs = [10.0, 10.5, 9.5, 10.2, 14.0, 14.5, 15.0, 9.0, 8.5, 10.0]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["t", "x"])
    got = {
        r["t"]: r
        for r in cusum(df, "t", "x", k=0.5, h=3.0, target=10.0).collect()
    }
    want = _cusum_ref(xs, 10.0, 0.5)
    for i, (cp, cn) in enumerate(want):
        assert abs(got[i]["cusum_pos"] - cp) < 1e-9, i
        assert abs(got[i]["cusum_neg"] - cn) < 1e-9, i
        assert got[i]["alarm_pos"] == (cp > 3.0)
        assert got[i]["alarm_neg"] == (cn > 3.0)
    # the planted level shift at t=4..6 must alarm
    assert any(got[i]["alarm_pos"] for i in (4, 5, 6))


def test_cusum_auto_target_uses_exact_mean(spark):
    from gofast_spark.ts.changepoint import cusum

    xs = [4.0, 6.0, 5.0, 5.0, 9.0, 1.0]  # mean exactly 5
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["t", "x"])
    auto = {r["t"]: r for r in cusum(df, "t", "x", k=0.25).collect()}
    fixed = {
        r["t"]: r for r in cusum(df, "t", "x", k=0.25, target=5.0).collect()
    }
    for i in range(len(xs)):
        assert abs(auto[i]["cusum_pos"] - fixed[i]["cusum_pos"]) < 1e-9
        assert abs(auto[i]["cusum_neg"] - fixed[i]["cusum_neg"]) < 1e-9


def test_cusum_repartition_invariant(spark):
    from gofast_spark.ts.changepoint import cusum

    xs = [float((i * 13) % 7) for i in range(40)]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["t", "x"])
    a = sorted(map(tuple, cusum(df, "t", "x", k=0.1).collect()))
    b = sorted(
        map(tuple, cusum(df.repartition(9), "t", "x", k=0.1).collect())
    )
    assert a == b
