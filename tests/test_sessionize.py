"""Batch sessionization + compaction (operators/sessionize.py)."""

from __future__ import annotations

import datetime as dt
import glob
import os

from pyspark.sql import functions as F

from gofast_spark.operators import compact_files, session_stats, sessionize


def _t(minute):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60)


def test_sessionize_gap_splits(spark):
    rows = [
        (1, _t(0)), (1, _t(10)), (1, _t(50)), (1, _t(55)),  # 2 sessions
        (2, _t(5)),                                          # 1 session
    ]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp")
    got = {
        (r["user"], r["ts"]): r["session_id"]
        for r in sessionize(df, "user", "ts", gap="30 minutes").collect()
    }
    assert got == {
        (1, _t(0)): 1, (1, _t(10)): 1,
        (1, _t(50)): 2, (1, _t(55)): 2,
        (2, _t(5)): 1,
    }


def test_session_stats(spark):
    rows = [(1, _t(0)), (1, _t(10)), (1, _t(50))]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp")
    stats = {
        r["session_id"]: (r["n_events"], r["duration_sec"])
        for r in session_stats(df, "user", "ts", gap="30 minutes").collect()
    }
    assert stats == {1: (2, 600), 2: (1, 0)}


def test_boundary_gap_exactly_at_timeout_continues(spark):
    # gap strictly GREATER than timeout starts a new session
    rows = [(1, _t(0)), (1, _t(30))]
    df = spark.createDataFrame(rows, "user bigint, ts timestamp")
    got = [
        r["session_id"]
        for r in sessionize(df, "user", "ts", gap="30 minutes")
        .orderBy("ts")
        .collect()
    ]
    assert got == [1, 1]


def test_compact_files(spark, tmp_path):
    path = os.path.join(str(tmp_path), "frag")
    # 40 tiny files
    spark.range(10_000).repartition(40).write.parquet(path)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 40
    n = compact_files(spark, path, target_file_mb=128)
    assert n == 1
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 1
    assert spark.read.parquet(path).count() == 10_000
