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
