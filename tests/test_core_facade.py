"""Fluent facade behavior (Data/Frames/Mergeable*, SURVEY §3.2): the
reference's deferred-op queue semantics on top of Spark's lazy plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_data_chain(spark):
    from gofast_spark import Data

    df = spark.createDataFrame(
        [(1, "A B", 10.0), (2, "c d", None), (3, "e f", 30.0)],
        ["id", "Name Col", "val"],
    )
    out = (
        Data(df)
        .sanitize()                       # "Name Col" -> name_col
        .drop_nan(["val"])
        .filter(F.col("val") > 5)
        .rename({"val": "value"})
        .encode("name_col")
        .execute()
    )
    rows = out.orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 3]
    assert "name_col_id" in out.columns and "value" in out.columns


def test_frames_merge_concat_compare_add(spark):
    from gofast_spark import Frames

    a = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
    b = spark.createDataFrame([(1, 100), (2, 200)], ["k", "v"])
    merged = Frames([a, b.withColumnRenamed("v", "w")]).merge(on="k").execute()
    assert merged.count() == 2 and set(merged.columns) == {"k", "v", "w"}

    cat = Frames([a, b]).concat().execute()
    assert cat.count() == 4

    assert Frames([a, a]).compare() is True
    assert Frames([a, b]).compare() is False

    added = Frames([a, b]).add(on="k").execute()
    got = {r["k"]: r["v"] for r in added.collect()}
    assert got == {1: 110, 2: 220}


def test_frames_execute_requires_op(spark):
    from gofast_spark import Frames

    with pytest.raises(ValueError, match="no operation queued"):
        Frames([spark.range(1)]).execute()


def test_mergeable_series_and_frames(spark):
    from gofast_spark import MergeableFrames, MergeableSeries

    df = spark.createDataFrame([(1, 5.0), (2, 50.0)], ["id", "v"])
    pred = (
        MergeableSeries(F.col("v") > 1) & ~MergeableSeries(F.col("v") > 10)
    ).execute()
    assert [r["id"] for r in df.where(pred).collect()] == [1]

    ba = df.select("id", (F.col("v") > 1).alias("f"))
    bb = df.select("id", (F.col("v") > 10).alias("f"))
    both = (MergeableFrames(ba, key="id") & MergeableFrames(bb, key="id")).execute()
    got = {r["id"]: r["f"] for r in both.collect()}
    assert got == {1: False, 2: True}
    either = (MergeableFrames(ba, key="id") | MergeableFrames(bb, key="id")).execute()
    got = {r["id"]: r["f"] for r in either.collect()}
    assert got == {1: True, 2: True}
