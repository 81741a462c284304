"""Behavior tests for the time-series pack (validator contracts, detrend,
cutoff splits — the pieces not covered by the oracle catalog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ts_validator_coerces_and_errors(spark):
    from gofast_spark.ts import ts_validator

    df = spark.createDataFrame(
        [("2024-01-01", 1.0), (None, 2.0)], ["dt", "v"]
    )
    out = ts_validator(df, "dt", value_col="v")
    assert dict(out.dtypes)["dt"] == "timestamp"
    assert out.count() == 1  # null dt dropped
    with pytest.raises(ValueError, match="not in frame"):
        ts_validator(df, "nope")
    with pytest.raises(ValueError, match="value column"):
        ts_validator(df.withColumn("s", F.lit("x")), "dt", value_col="s")


def test_detrend_removes_linear_trend(spark):
    from gofast_spark.ts import detrend

    rows = [(i, 3.0 * i + 10.0) for i in range(50)]
    df = spark.createDataFrame(rows, ["t", "v"])
    out = detrend(df, "v", "t", time_index_col="t")
    resid = [abs(r["v_detrended"]) for r in out.collect()]
    assert max(resid) < 1e-9  # perfect line -> zero residuals


def test_ts_split_cutoff_and_frac(spark):
    from gofast_spark.ts import ts_split

    df = spark.createDataFrame(
        [(f"2024-01-{d:02d}", d) for d in range(1, 11)], ["dt", "i"]
    ).withColumn("dt", F.to_timestamp("dt"))
    train, test = ts_split(df, "dt", cutoff="2024-01-08")
    assert (train.count(), test.count()) == (8, 2)
    train2, test2 = ts_split(df, "dt", test_frac=0.3, tiebreak="i")
    assert (train2.count(), test2.count()) == (7, 3)
    # test rows are the latest ones
    assert min(r["i"] for r in test2.collect()) == 8


def test_infer_frequency_mode(spark):
    from gofast_spark.ts import infer_frequency, ts_validator

    rows = ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
            "2024-01-01 00:02:00", "2024-01-01 00:02:30"]
    df = ts_validator(spark.createDataFrame([(r,) for r in rows], ["dt"]), "dt")
    out = infer_frequency(df, "dt").first()
    assert out["freq_seconds"] == 60 and out["n_gaps"] == 2


def test_smart_ts_detector(spark):
    from gofast_spark.ts import smart_ts_detector

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "abc", 1.0)], ["when", "junk", "v"]
    )
    assert smart_ts_detector(df) == "when"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        smart_ts_detector(spark.createDataFrame([(1.0,)], ["v"]))


def test_ccf_lag_alignment(spark):
    from gofast_spark.ts import ccf

    # v perfectly tracks u shifted by one step -> ccf_1 == 1
    rows = [(i, float(i % 7), float((i - 1) % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, ["t", "u", "v"])
    out = ccf(df, "v", "u", "t", lags=(0, 1)).first()
    assert abs(out["ccf_1"] - 1.0) < 1e-9
    assert out["ccf_0"] < 0.99


def test_scrape_and_load_dataset(spark):
    import pytest as _pytest

    from gofast_spark.sources.io import load_dataset, scrape_web_data

    df = load_dataset(spark, "sales", n_rows=100)
    assert df.count() == 100
    with _pytest.raises(KeyError):
        load_dataset(spark, "nope")

    html = "<table><tr><th>a</th></tr><tr><td>1</td></tr></table>"
    try:
        out = scrape_web_data(spark, "http://x.invalid", fetcher=lambda u, **k: html)
    except ImportError:
        _pytest.skip("no HTML parser installed; gate verified")
    assert out.count() == 1


def test_pacf_durbin_levinson_and_smoke(spark):
    from gofast_spark.ts import pacf
    from gofast_spark.ts.engineering import durbin_levinson

    # closed form: AR(1) ACF rho_k = phi^k -> PACF = [phi, 0, 0, ...]
    phi = 0.8
    rho = [phi**k for k in range(5)]
    p = durbin_levinson(rho)
    assert abs(p[0] - phi) < 1e-12
    assert all(abs(x) < 1e-10 for x in p[1:])

    # end-to-end: distributed ACF feeds the recursion, values bounded
    vals, v = [], 0.0
    for i in range(200):
        eps = ((i * 2654435761 + 12345) % 1000) / 1000.0 - 0.5
        v = 0.8 * v + eps
        vals.append((i, v))
    df = spark.createDataFrame(vals, ["t", "v"])
    out = pacf(df, "v", "t", max_lag=4)
    assert len(out) == 4 and all(-1.0 <= x <= 1.0 for x in out)
    assert out[0] > 0.3  # positive lag-1 partial for an AR(1)-like series


def test_interpolate_grid_idw(spark):
    from gofast_spark.operators import interpolate_grid

    pts = spark.createDataFrame(
        [(0.0, 0.0, 10.0), (2.0, 0.0, 20.0), (50.0, 50.0, 999.0)],
        ["px", "py", "val"],
    )
    grid = spark.createDataFrame(
        [(1.0, 0.0), (0.0, 0.0), (40.0, 40.0)], ["gx", "gy"]
    )
    out = interpolate_grid(
        pts, grid, point_xy=("px", "py"), grid_xy=("gx", "gy"),
        value_col="val", radius=3.0,
    )
    got = {(r["gx"], r["gy"]): r["value_idw"] for r in out.collect()}
    assert abs(got[(1.0, 0.0)] - 15.0) < 1e-9   # midpoint: equal weights
    assert got[(0.0, 0.0)] == 10.0              # exact-match short-circuit
    assert (40.0, 40.0) not in got              # no neighbor in radius


def test_savgol_numpy_kernel_reference_values(spark):
    """Scipy-free SG kernel: a quadratic is reproduced EXACTLY by a
    degree-2 SG filter (polynomial reproduction property), and the
    classic 5-point quadratic interior weights [-3,12,17,12,-3]/35 hold."""
    import numpy as np

    from gofast_spark.ts.decompose import _savgol_1d

    t = np.arange(20, dtype=float)
    quad = 2.0 + 0.5 * t - 0.3 * t * t
    out = _savgol_1d(quad, 5, 2)
    assert np.allclose(out, quad, atol=1e-9)

    x = np.array([1.0, 4.0, 9.0, 2.0, 7.0, 3.0, 8.0])
    out = _savgol_1d(x, 5, 2)
    w = np.array([-3.0, 12.0, 17.0, 12.0, -3.0]) / 35.0
    for i in range(2, 5):
        assert out[i] == pytest.approx(w @ x[i - 2 : i + 3], abs=1e-12)


def test_savgol_smooth_spark_plumbing(spark):
    from gofast_spark.ts import savgol_smooth

    rows = [("s1", f"{i:02d}", float(i * i)) for i in range(12)]
    df = spark.createDataFrame(rows, ["series", "t", "v"])
    out = savgol_smooth(df, "series", "t", "v", window_length=5, polyorder=2)
    got = {r["t"]: r["v_sg"] for r in out.collect()}
    assert len(got) == 12
    # degree-2 SG reproduces the quadratic exactly, edges included
    for i in range(12):
        assert got[f"{i:02d}"] == pytest.approx(float(i * i), abs=1e-8)


def test_seasonal_decompose_reconstruction(spark):
    """trend + seasonal + resid == value wherever trend is defined, and
    the seasonal component sums to ~0 over the phases."""
    import datetime

    from gofast_spark.ts import seasonal_decompose

    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), 100.0 + i + 10.0 * (i % 7))
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, ["d", "v"])
    out = seasonal_decompose(df, "v", "d", period=7).collect()
    assert len(out) == 35
    seas = {}
    for r in out:
        if r["trend"] is not None:
            assert r["v"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["resid"], abs=1e-9
            )
        seas[r["d"].toordinal() % 7] = r["seasonal"]
    assert sum(seas.values()) == pytest.approx(0.0, abs=1e-9)


def test_pacf_frame_matches_driver_recursion(spark):
    """In-plan unrolled Durbin-Levinson == driver-side recursion on the
    collected ACF, to 1e-12 (same arithmetic, different execution)."""
    from gofast_spark.ts import acf, pacf_frame
    from gofast_spark.ts.engineering import durbin_levinson

    vals, v = [], 0.0
    for i in range(300):
        eps = ((i * 48271 + 11) % 997) / 997.0 - 0.5
        v = 0.6 * v - 0.25 * (vals[-1][1] if vals else 0.0) + eps
        vals.append((i, v))
    df = spark.createDataFrame(vals, ["t", "v"])

    K = 5
    row = acf(df, "v", "t", lags=tuple(range(1, K + 1))).first()
    expected = durbin_levinson([1.0] + [row[f"acf_{k}"] for k in range(1, K + 1)])
    got = pacf_frame(df, "v", "t", max_lag=K).first()
    for k in range(1, K + 1):
        assert abs(got[f"pacf_{k}"] - expected[k - 1]) < 1e-12, k
