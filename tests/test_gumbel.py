"""gumbel_fit: moment identities + recovery of planted parameters."""

from __future__ import annotations

import math

import numpy as np


def test_gumbel_fit_moment_identities(spark):
    from gofast_spark.stats.descriptive import gumbel_fit

    xs = [10.0, 12.5, 9.0, 15.0, 11.0, 13.0, 14.5, 10.5]
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    row = gumbel_fit(df, "x", return_periods=(10,)).collect()[0]
    m = sum(xs) / len(xs)
    s = math.sqrt(sum((x - m) ** 2 for x in xs) / (len(xs) - 1))
    sigma = s * math.sqrt(6.0) / math.pi
    mu = m - 0.5772156649015329 * sigma
    assert abs(row["mu"] - mu) < 1e-9
    assert abs(row["sigma"] - sigma) < 1e-9
    assert abs(
        row["level_10"] - (mu - sigma * math.log(-math.log(0.9)))
    ) < 1e-9
    assert row["n"] == len(xs)


def test_gumbel_fit_recovers_planted(spark):
    from gofast_spark.stats.descriptive import gumbel_fit

    rng = np.random.RandomState(6)
    xs = [float(x) for x in rng.gumbel(loc=20.0, scale=4.0, size=8000)]
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    row = gumbel_fit(df, "x").collect()[0]
    assert abs(row["mu"] - 20.0) < 0.4
    assert abs(row["sigma"] - 4.0) < 0.4
    # return levels increase with period
    assert row["level_100"] > row["level_10"] > row["mu"]
