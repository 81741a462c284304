"""Z-order clustering (sources/zorder.py)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from gofast_spark.sources.zorder import (
    interleave_bits,
    rank_normalize,
    write_zordered,
)


def _morton(xs, bits):
    out = 0
    for j in range(bits):
        for i, x in enumerate(xs):
            out |= ((x >> j) & 1) << (j * len(xs) + i)
    return out


def test_interleave_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 17), (65535, 65535)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = df.select(
        "a", "b", interleave_bits(["a", "b"], bits=16).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton([r["a"], r["b"]], 16)


def test_interleave_three_columns(spark):
    df = spark.createDataFrame([(5, 9, 2)], "a bigint, b bigint, c bigint")
    z = df.select(interleave_bits(["a", "b", "c"], bits=8).alias("z"))
    assert z.collect()[0]["z"] == _morton([5, 9, 2], 8)


def test_interleave_rejects_overflow(spark):
    with pytest.raises(ValueError, match="63-bit"):
        interleave_bits(["a", "b", "c", "d"], bits=16)


def test_rank_normalize_range(spark):
    df = spark.range(1000).select((F.col("id") * 37 % 997).alias("x"))
    out = rank_normalize(df, ["x"], bits=4)
    stats = out.agg(
        F.min("__zn_x").alias("lo"), F.max("__zn_x").alias("hi")
    ).collect()[0]
    assert stats["lo"] == 0 and stats["hi"] == 15


def test_write_zordered_improves_skipping(spark, tmp_path):
    """Files written in z-order must have far tighter per-file ranges on
    BOTH columns than an unsorted write — the property min/max skipping
    depends on."""
    df = spark.range(20_000).select(
        (F.col("id") * 7919 % 20011).alias("x"),
        (F.col("id") * 104729 % 20011).alias("y"),
    )
    path = os.path.join(str(tmp_path), "z")
    write_zordered(df, path, ["x", "y"], bits=10, num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 20_000

    def avg_span(frame, col):
        spans = (
            frame.withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .agg((F.max(col) - F.min(col)).alias("s"))
            .agg(F.avg("s").alias("a"))
            .collect()[0]["a"]
        )
        return spans

    # random layout: every file spans ~the full domain (~20k); z-order
    # should cut the average span on both dimensions substantially
    for c in ("x", "y"):
        assert avg_span(back, c) < 0.7 * 20011
