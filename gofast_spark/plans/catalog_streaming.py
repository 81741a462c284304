"""Streaming catalog entry (SURVEY §2.12): the daily windowed aggregate
runs through Structured Streaming (file source -> availableNow micro-batch
replay -> memory sink) and must produce EXACTLY the batch answer DuckDB
computes — the exactly-once semantics check, not just a smoke test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import query


@query(
    "streaming_window_counts",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           count(*) AS n,
           CAST(round(sum(value), 4) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling event-time windows over the events stream; the
    window start equals date_trunc('day') so the batch oracle is exact."""
    from gofast_spark.streaming import (
        read_event_stream,
        run_available_now,
        windowed_aggregate,
    )

    # engine nanos policy must be set before the streaming read, same as _t
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, "false") != "true":
        spark.conf.set(key, "true")
    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    agg = windowed_aggregate(
        stream,
        "ts",
        "1 day",
        group_cols=["event_type"],
        aggs={"*": "count", "value": "sum"},
    )
    out = run_available_now(agg, mode="complete")
    return out.select(
        F.col("w.start").cast("date").alias("day"),
        "event_type",
        "n",
        F.round("value_sum", 4).cast("double").alias("value_sum"),
    )
