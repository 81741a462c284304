"""Bucketed range join (operators/range_join.py)."""

from __future__ import annotations

import pytest

from gofast_spark.operators import range_join


def _run(spark, points, intervals, width):
    p = spark.createDataFrame([(x,) for x in points], "x double")
    iv = spark.createDataFrame(intervals, "iid bigint, lo double, hi double")
    out = range_join(p, iv, "x", "lo", "hi", bucket_width=width)
    return sorted((r["x"], r["iid"]) for r in out.collect())


def test_matches_bruteforce(spark):
    points = [-5.0, 0.0, 3.0, 7.5, 10.0, 42.0]
    intervals = [(1, -10.0, 0.0), (2, 0.0, 5.0), (3, 6.0, 10.0), (4, 50.0, 60.0)]
    expected = sorted(
        (x, i)
        for x in points
        for (i, lo, hi) in intervals
        if lo <= x <= hi
    )
    # every pair must appear EXACTLY once, for widths smaller than,
    # near, and larger than the interval lengths
    for w in (0.7, 3.0, 100.0):
        assert _run(spark, points, intervals, w) == expected


def test_degenerate_interval_matches_nothing(spark):
    assert _run(spark, [1.0], [(1, 5.0, 2.0)], 1.0) == []


def test_negative_coordinates(spark):
    got = _run(spark, [-7.2], [(1, -8.0, -7.0), (2, -7.0, -6.0)], 2.5)
    assert got == [(-7.2, 1)]


def test_rejects_bad_width(spark):
    p = spark.createDataFrame([(1.0,)], "x double")
    iv = spark.createDataFrame([(1, 0.0, 2.0)], "iid bigint, lo double, hi double")
    with pytest.raises(ValueError):
        range_join(p, iv, "x", "lo", "hi", bucket_width=0)


def test_plan_is_equi_join(spark):
    p = spark.createDataFrame([(1.0,)], "x double")
    iv = spark.createDataFrame(
        [(1, 0.0, 2.0)], "iid bigint, lo double, hi double"
    )
    plan = (
        range_join(p, iv, "x", "lo", "hi", bucket_width=1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
