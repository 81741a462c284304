"""double_ewma / brown_forecast vs the textbook recursions."""

from __future__ import annotations


def _brown(ys, alpha):
    s1 = s2 = None
    out = []
    for y in ys:
        s1 = y if s1 is None else alpha * y + (1 - alpha) * s1
        s2 = s1 if s2 is None else alpha * s1 + (1 - alpha) * s2
        level = 2 * s1 - s2
        trend = alpha / (1 - alpha) * (s1 - s2)
        out.append((s1, s2, level, trend))
    return out


def test_double_ewma_matches_recursion(spark):
    from gofast_spark.ts.engineering import double_ewma

    ys = [10.0, 12.0, 9.0, 15.0, 14.0, 18.0, 17.0, 21.0]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], ["t", "y"]
    )
    got = {
        r["t"]: r
        for r in double_ewma(df, "t", "y", alpha=0.5).collect()
    }
    want = _brown(ys, 0.5)
    assert len(got) == len(ys)
    for t, (s1, s2, level, trend) in enumerate(want):
        r = got[t]
        assert abs(r["s1"] - s1) < 1e-9, (t, "s1")
        # s2 is micro-unit quantized: <= 0.5e-6 per term error
        assert abs(r["s2"] - s2) < 1e-4, (t, "s2")
        assert abs(r["level"] - level) < 2e-4, (t, "level")
        assert abs(r["trend"] - trend) < 2e-4, (t, "trend")


def test_brown_forecast_last_state(spark):
    from gofast_spark.ts.engineering import brown_forecast, double_ewma

    ys = [5.0, 7.0, 9.0, 11.0, 13.0]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], ["t", "y"]
    )
    sm = double_ewma(df, "t", "y", alpha=0.5)
    last = {r["t"]: r for r in sm.collect()}[len(ys) - 1]
    fc = {r["h"]: r["forecast"] for r in
          brown_forecast(sm, "t", horizon=3).collect()}
    assert set(fc) == {1, 2, 3}
    for h in (1, 2, 3):
        assert abs(fc[h] - (last["level"] + h * last["trend"])) < 1e-9


def test_double_ewma_repartition_invariant(spark):
    from gofast_spark.ts.engineering import double_ewma

    ys = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    df = spark.createDataFrame([(i, y) for i, y in enumerate(ys)], ["t", "y"])
    a = sorted(map(tuple, double_ewma(df, "t", "y").collect()))
    b = sorted(
        map(tuple, double_ewma(df.repartition(7), "t", "y").collect())
    )
    assert a == b


def test_croston_matches_recursion(spark):
    from gofast_spark.ts.engineering import croston_forecast

    # day index, demand (zeros = no demand)
    series = {0: 5.0, 3: 7.0, 4: 6.0, 9: 8.0, 10: 0.0, 15: 9.0}
    df = spark.createDataFrame(list(series.items()), ["t", "y"])
    got = {r["t"]: r for r in croston_forecast(df, "t", "y").collect()}
    # reference recursions over nonzero periods
    nz = [(t, z) for t, z in sorted(series.items()) if z != 0]
    zh = ph = None
    prev_t = None
    for t, z in nz:
        gap = 1 if prev_t is None else t - prev_t
        zh = z if zh is None else 0.5 * z + 0.5 * zh
        ph = gap if ph is None else 0.5 * gap + 0.5 * ph
        prev_t = t
        r = got[t]
        assert abs(r["z_hat"] - zh) < 1e-9
        assert abs(r["p_hat"] - ph) < 1e-9
        assert abs(r["croston_rate"] - zh / ph) < 1e-9
    assert 10 not in got  # zero-demand day excluded
