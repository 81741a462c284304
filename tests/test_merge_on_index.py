"""merge_frames_on_index: explicit-row-key column alignment
(reference gofast/dataops/quality.py:1060)."""

from __future__ import annotations

import pytest


def test_merge_on_index_outer(spark):
    from gofast_spark.operators import merge_frames_on_index

    a = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "x"])
    b = spark.createDataFrame([(2, "b2"), (3, "b3")], ["k", "y"])
    out = merge_frames_on_index(a, b, index_col="k")
    rows = {r["k"]: (r["x"], r["y"]) for r in out.collect()}
    assert rows == {1: (10.0, None), 2: (20.0, "b2"), 3: (None, "b3")}


def test_merge_on_index_inner_suffixes_overlap(spark):
    from gofast_spark.operators import merge_frames_on_index

    a = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"])
    b = spark.createDataFrame([(1, 9.0)], ["k", "v"])
    c = spark.createDataFrame([(1, 5.0), (2, 6.0)], ["k", "v"])
    out = merge_frames_on_index(a, b, c, index_col="k", join_type="inner")
    assert sorted(out.columns) == ["k", "v", "v_1", "v_2"]
    r = out.filter("k = 1").collect()[0]
    assert (r["v"], r["v_1"], r["v_2"]) == (1.0, 9.0, 5.0)


def test_merge_on_index_axis0_union(spark):
    from gofast_spark.operators import merge_frames_on_index

    a = spark.createDataFrame([(1, 1.0)], ["k", "x"])
    b = spark.createDataFrame([(2, "s")], ["k", "y"])
    out = merge_frames_on_index(a, b, index_col="k", axis=0)
    assert sorted(out.columns) == ["k", "x", "y"]
    assert out.count() == 2


def test_merge_on_index_missing_key_raises(spark):
    from gofast_spark.operators import merge_frames_on_index

    a = spark.createDataFrame([(1, 1.0)], ["k", "x"])
    b = spark.createDataFrame([(2, 2.0)], ["q", "y"])
    with pytest.raises(KeyError):
        merge_frames_on_index(a, b, index_col="k")
