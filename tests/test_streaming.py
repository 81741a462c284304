"""Structured Streaming surface: micro-batch replay must equal the batch
answer; streaming dedup suppresses within-watermark duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_stream_window_equals_batch(spark, sf_small):
    from gofast_spark.plans.catalog import QUERIES

    out = QUERIES["streaming_window_counts"](spark, sf_small)
    got = {(r["day"], r["event_type"]): r["n"] for r in out.collect()}
    # independent batch computation of the same windows
    from gofast_spark.plans.catalog import _t

    e = _t(spark, sf_small, "events")
    ref = (
        e.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {(r["day"], r["event_type"]): r["n"] for r in ref}
    assert got == want


def test_stream_dedup_within_watermark(spark, tmp_path):
    import pandas as pd

    from gofast_spark.streaming import run_available_now, stream_dedup
    from gofast_spark.streaming.ops import EVENTS_RAW_SCHEMA

    base = 1_700_000_000_000_000_000  # nanos epoch
    rows = [
        (1, base, 10, "click", 1.0, ""),
        (1, base + 60_000_000_000, 10, "click", 1.0, ""),  # dup event_id, +60s
        (2, base + 120_000_000_000, 11, "view", 2.0, ""),
    ]
    pdf = pd.DataFrame(rows, columns=[f.name for f in EVENTS_RAW_SCHEMA.fields])
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf, EVENTS_RAW_SCHEMA).write.parquet(src)

    sdf = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    deduped = stream_dedup(sdf, ["event_id"], watermark="1 hour")
    out = run_available_now(deduped, mode="append")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]
