"""Structured Streaming surface (SURVEY §2.12 — net-new vs the reference,
which has no streaming engine; its only stream-adjacent code is a Kafka
task trigger, gofast/mlops/automation.py:1461)."""

from gofast_spark.streaming.ops import (
    read_event_stream,
    stream_static_enrich,
    stream_stream_interval_join,
    write_stream_to_warehouse,
    read_document_stream,
    stream_merge_upsert,
    stream_dedup_index_upsert,
    dedup_health_card_from_tables,
    streaming_token_counts,
    run_available_now,
    sessionized_aggregate,
    stateful_running_totals,
    stream_dedup,
    windowed_aggregate,
)

__all__ = [
    "read_event_stream",
    "read_document_stream",
    "streaming_token_counts",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "write_stream_to_warehouse",
    "stream_merge_upsert",
    "stream_dedup_index_upsert",
    "dedup_health_card_from_tables",
    "windowed_aggregate",
    "sessionized_aggregate",
    "stream_dedup",
    "stateful_running_totals",
    "run_available_now",
]
