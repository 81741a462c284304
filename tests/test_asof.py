"""As-of join semantics (operators/asof.py) vs hand-computed matches."""

from __future__ import annotations

import datetime as dt

from gofast_spark.operators import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (1, _t(20), "b"), (2, _t(15), "c"), (3, _t(5), "d")],
        "k bigint, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [(1, _t(8), 100), (1, _t(10), 200), (1, _t(18), 300), (2, _t(30), 400)],
        "k bigint, ts timestamp, rval bigint",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["lval"]): r["rval_r"]
        for r in asof_join(left, right, "k", "ts").collect()
    }
    # k=1 ts=10 matches the EQUAL-ts right row (inclusive); ts=20 -> 18s row
    # k=2 ts=15: right row is later -> no match; k=3: no right rows at all
    assert got == {(1, "a"): 200, (1, "b"): 300, (2, "c"): None, (3, "d"): None}


def test_forward_direction(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["lval"]): r["rval_r"]
        for r in asof_join(left, right, "k", "ts", direction="forward").collect()
    }
    assert got == {(1, "a"): 200, (1, "b"): None, (2, "c"): 400, (3, "d"): None}


def test_backward_tolerance(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["lval"]): r["rval_r"]
        for r in asof_join(
            left, right, "k", "ts", tolerance="1 seconds"
        ).collect()
    }
    # within 1s: only the equal-ts match survives
    assert got == {(1, "a"): 200, (1, "b"): None, (2, "c"): None, (3, "d"): None}


def test_right_ts_carried_with_suffix(spark):
    left, right = _frames(spark)
    row = [
        r
        for r in asof_join(left, right, "k", "ts").collect()
        if r["lval"] == "b"
    ][0]
    assert row["ts_r"] == _t(18) and row["rval_r"] == 300


def test_null_payload_fields_carried_atomically(spark):
    """A right row with NULL payload fields must be attached AS A ROW —
    per-column carries would resurrect older non-null values."""
    left = spark.createDataFrame(
        [(1, _t(25), "x")], "k bigint, ts timestamp, lval string"
    )
    right = spark.createDataFrame(
        [(1, _t(10), 100), (1, _t(20), None)],
        "k bigint, ts timestamp, rval bigint",
    )
    row = asof_join(left, right, "k", "ts").collect()[0]
    assert row["ts_r"] == _t(20)
    assert row["rval_r"] is None
