"""weibull_fit recovers planted Weibull parameters from KM data."""

from __future__ import annotations

import numpy as np


def test_weibull_fit_recovers_parameters(spark):
    from gofast_spark.stats.survival import weibull_fit

    rng = np.random.RandomState(12)
    shape, scale = 1.8, 50.0
    durs = (scale * rng.weibull(shape, size=5000)).astype(int) + 1
    rows = [(int(d), 1) for d in durs]  # fully observed
    df = spark.createDataFrame(rows, ["dur", "ev"])
    row = weibull_fit(df, "dur", "ev", bins=None).collect()[0]
    assert abs(row["shape"] - shape) < 0.25, row["shape"]
    assert abs(row["scale"] - scale) < 6.0, row["scale"]
    assert row["n_points"] > 10


def test_weibull_fit_exponential_is_shape_one(spark):
    from gofast_spark.stats.survival import weibull_fit

    rng = np.random.RandomState(4)
    durs = rng.exponential(30.0, size=5000).astype(int) + 1
    df = spark.createDataFrame([(int(d), 1) for d in durs], ["dur", "ev"])
    row = weibull_fit(df, "dur", "ev", bins=None).collect()[0]
    assert abs(row["shape"] - 1.0) < 0.2
