"""Streaming CDC-apply sink: merge_upsert per micro-batch with
checkpointed exactly-once resume."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from gofast_spark.streaming import stream_merge_upsert

SCHEMA = pa.schema(
    [("k", pa.int64()), ("v", pa.string()), ("ver", pa.int64())]
)


def _write(path: str, rows: list[tuple]) -> None:
    k, v, ver = zip(*rows)
    pq.write_table(
        pa.table({"k": list(k), "v": list(v), "ver": list(ver)}, schema=SCHEMA),
        path,
    )


def _read_stream(spark, src):
    return (
        spark.readStream.schema("k long, v string, ver long").parquet(src)
    )


def _state(spark, table):
    return {
        r.k: (r.v, r.ver) for r in spark.read.parquet(table).collect()
    }


def test_stream_merge_upsert_bootstrap_update_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1 bootstraps; two versions of k=1 in one batch -> dedup by ver
    _write(f"{src}/b1.parquet", [(1, "a0", 1), (1, "a1", 2), (2, "b0", 1)])
    stream_merge_upsert(
        _read_stream(spark, src), table, "k",
        checkpoint=ckpt, dedup_order_col="ver",
    )
    assert _state(spark, table) == {1: ("a1", 2), 2: ("b0", 1)}

    # batch 2 (same checkpoint -> only the new file) updates k=2, inserts k=3
    _write(f"{src}/b2.parquet", [(2, "b9", 5), (3, "c0", 1)])
    stream_merge_upsert(
        _read_stream(spark, src), table, "k",
        checkpoint=ckpt, dedup_order_col="ver",
    )
    assert _state(spark, table) == {
        1: ("a1", 2), 2: ("b9", 5), 3: ("c0", 1)
    }

    # re-run with no new files: nothing changes (exactly-once resume)
    stream_merge_upsert(
        _read_stream(spark, src), table, "k",
        checkpoint=ckpt, dedup_order_col="ver",
    )
    assert _state(spark, table) == {
        1: ("a1", 2), 2: ("b9", 5), 3: ("c0", 1)
    }
