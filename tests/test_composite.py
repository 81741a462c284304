"""Composite sanitize, selectors, rowwise bridge, and outlier-impact
assessment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_sanitize_composite(spark):
    from gofast_spark.operators import sanitize

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (1, 10.0, "A"), (2, None, "b"), (3, 1e9, "C")],
        ["id", "v", "s"],
    )
    out = sanitize(
        df, fill_missing="mean", remove_duplicates=True,
        outlier_method="zscore", threshold=1.0, consistency_transform="lower",
    )
    rows = out.collect()
    assert len({tuple(r) for r in rows}) == len(rows)  # deduped
    assert all(r["s"] == r["s"].lower() for r in rows)
    assert all(r["v"] is not None for r in rows)


def test_format_long_column_names(spark):
    from gofast_spark.operators import format_long_column_names

    df = spark.createDataFrame(
        [(1, 2)], ["a_very_long_column_name_x", "a_very_long_column_name_y"]
    )
    out = format_long_column_names(df, max_length=20)
    assert all(len(c) <= 20 for c in out.columns)
    assert len(set(out.columns)) == 2  # dedup'd truncations


def test_column_selectors(spark):
    from gofast_spark.operators import ColumnSelector, DataFrameSelector

    df = spark.createDataFrame([(1, 2.0, "x")], ["id", "val", "name"])
    assert ColumnSelector(["id"]).fit_transform(df).columns == ["id"]
    assert ColumnSelector(pattern="^va").fit_transform(df).columns == ["val"]
    with pytest.raises(KeyError):
        ColumnSelector(["nope"]).fit(df)
    assert DataFrameSelector("numeric").fit_transform(df).columns == ["id", "val"]
    assert DataFrameSelector("categorical").fit_transform(df).columns == ["name"]


def test_speed_rowwise_process(spark):
    from gofast_spark.operators import speed_rowwise_process

    df = spark.createDataFrame([(i,) for i in range(100)], ["x"])

    def double(pdf):
        pdf["y"] = pdf["x"] * 2
        return pdf[["x", "y"]]

    out = speed_rowwise_process(df, double, "x bigint, y bigint")
    assert out.where(F.col("y") != F.col("x") * 2).count() == 0


def test_assess_outlier_impact(spark):
    from gofast_spark.operators import assess_outlier_impact
    from gofast_spark.sources.datasets import make_regression_data

    df = make_regression_data(spark, 300, 2, noise=0.1)
    # plant gross outliers in the label
    spiked = df.withColumn(
        "y",
        F.when(F.col("sample_id") % 50 == 0, F.col("y") + 1000.0).otherwise(
            F.col("y")
        ),
    )
    report = assess_outlier_impact(spiked, ["x_0", "x_1"], "y")
    rows = {r["variant"]: r for r in report.collect()}
    assert rows["without_outliers"]["rmse"] < rows["with_outliers"]["rmse"]
    assert rows["without_outliers"]["n"] < rows["with_outliers"]["n"]


def test_features_in_split(spark):
    from gofast_spark.operators.checks import features_in

    df = spark.createDataFrame([(1, "a", 2.0)], ["i", "s", "d"])
    num, cat = features_in(df)
    assert set(num) == {"i", "d"} and cat == ["s"]
    assert features_in(df, include="numeric") == (num, [])
    assert features_in(df, include="categorical") == ([], cat)


def test_is_in_if_policies(spark):
    import pytest

    from gofast_spark.operators.checks import is_in_if

    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    assert is_in_if(df, "a")
    assert is_in_if(["x", "y"], ["x"])
    with pytest.raises(ValueError, match="not found"):
        is_in_if(df, "zz")
    assert is_in_if(df, ["a", "zz"], error="ignore", return_diff=True) == ["zz"]


def test_compare_frames_multiset(spark):
    from gofast_spark.operators.reshape import compare_frames

    a = spark.createDataFrame([(1,), (2,), (2,)], ["x"])
    b = spark.createDataFrame([(2,), (1,), (2,)], ["x"])
    c = spark.createDataFrame([(1,), (2,)], ["x"])
    assert compare_frames(a, b)      # order-insensitive multiset equality
    assert not compare_frames(a, c)  # multiplicity matters
