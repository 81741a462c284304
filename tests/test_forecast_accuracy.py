"""forecast_accuracy vs hand-computed sMAPE/MASE/U2."""

from __future__ import annotations

import math


def test_forecast_accuracy_reference(spark):
    from gofast_spark.metrics import forecast_accuracy

    ys = [10.0, 12.0, 11.0, 14.0, 13.0, 16.0]
    fs = [9.0, 13.0, 10.0, 15.0, 12.0, 18.0]
    df = spark.createDataFrame(
        [(i, y, f) for i, (y, f) in enumerate(zip(ys, fs))],
        ["t", "y", "f"],
    )
    row = forecast_accuracy(df, "t", "y", "f").collect()[0]
    n = len(ys)
    smape = sum(2 * abs(y - f) / (abs(y) + abs(f)) for y, f in zip(ys, fs)) / n
    mae = sum(abs(y - f) for y, f in zip(ys, fs)) / n
    nmae = sum(abs(ys[i] - ys[i - 1]) for i in range(1, n)) / (n - 1)
    u2 = math.sqrt(
        sum((y - f) ** 2 for y, f in zip(ys, fs))
        / sum((ys[i] - ys[i - 1]) ** 2 for i in range(1, n))
    )
    assert row["n"] == n
    assert abs(row["smape"] - smape) < 1e-5
    assert abs(row["mase"] - mae / nmae) < 1e-4
    assert abs(row["theil_u2"] - u2) < 1e-3


def test_forecast_accuracy_perfect_forecast(spark):
    from gofast_spark.metrics import forecast_accuracy

    rows = [(i, 10.0 + i, 10.0 + i) for i in range(8)]
    df = spark.createDataFrame(rows, ["t", "y", "f"])
    row = forecast_accuracy(df, "t", "y", "f").collect()[0]
    assert row["smape"] == 0.0
    assert row["mase"] == 0.0
    assert row["theil_u2"] == 0.0
