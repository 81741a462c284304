"""Concat-and-chunk sequence packing (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gofast_spark.operators import pack_sequences, sequence_fill_stats


def _docs(spark):
    # token stream: doc1=3, doc2=5, doc3=0, doc4=6, doc5=2 -> 16 tokens
    rows = [(1, 3), (2, 5), (3, 0), (4, 6), (5, 2)]
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")


def test_spans_exact_layout(spark):
    # seq_len=4: stream offsets doc1 [0,3), doc2 [3,8), doc4 [8,14), doc5 [14,16)
    out = pack_sequences(_docs(spark), "doc_id", "n_tokens", seq_len=4)
    spans = {(r["doc_id"], r["seq_id"]): (r["span_begin"], r["span_tokens"])
             for r in out.collect()}
    assert spans == {
        (1, 0): (0, 3),
        (2, 0): (3, 1),
        (2, 1): (0, 4),
        (4, 2): (0, 4),
        (4, 3): (0, 2),
        (5, 3): (2, 2),
    }


def test_fill_stats_full_sequences(spark):
    out = pack_sequences(_docs(spark), "doc_id", "n_tokens", seq_len=4)
    stats = {r["seq_id"]: (r["n_docs"], r["n_tokens"])
             for r in sequence_fill_stats(out).collect()}
    # 16 tokens / 4 = exactly 4 full sequences
    assert stats == {0: (2, 4), 1: (1, 4), 2: (1, 4), 3: (2, 4)}


def test_last_sequence_partial(spark):
    out = pack_sequences(_docs(spark), "doc_id", "n_tokens", seq_len=5)
    stats = sequence_fill_stats(out).orderBy("seq_id").collect()
    # 16 tokens / 5: seqs 0..2 full, seq 3 holds 1 token
    assert [r["n_tokens"] for r in stats] == [5, 5, 5, 1]
    # every non-terminal sequence is exactly full (zero padding waste)
    for r in stats[:-1]:
        assert r["n_tokens"] == 5


def test_doc_level_mode(spark):
    out = pack_sequences(
        _docs(spark), "doc_id", "n_tokens", seq_len=4, explode_spans=False
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[2]["start_offset"] == 3
    assert (rows[2]["first_seq"], rows[2]["last_seq"], rows[2]["n_seqs"]) == (0, 1, 2)
    # zero-token doc: no sequences, null bounds
    assert rows[3]["n_seqs"] == 0
    assert rows[3]["first_seq"] is None


def test_token_conservation(spark):
    out = pack_sequences(_docs(spark), "doc_id", "n_tokens", seq_len=7)
    total = out.agg(F.sum("span_tokens")).first()[0]
    assert total == 16


def test_bad_seq_len(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark), "doc_id", "n_tokens", seq_len=0)


def test_no_global_single_reducer_window(spark):
    """The packing plan must not contain an unpartitioned row window over
    the corpus (the prefix sum's whole point)."""
    from tests.test_plans import _plan

    out = pack_sequences(_docs(spark), "doc_id", "n_tokens", seq_len=4)
    plan = _plan(out)
    # the only unpartitioned window runs over the n-partition offsets
    # frame; the corpus-side window partitions by __pid
    assert "partitionBy=[__pid]" in plan.replace(" ", "") or "__pid" in plan


def test_shuffled_token_shards_deterministic_and_mixing(spark):
    from gofast_spark.operators import shuffled_token_shards

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("tok")
    )
    a = shuffled_token_shards(df, "doc_id", "tok", budget=50)
    b = shuffled_token_shards(df.repartition(13), "doc_id", "tok", budget=50)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, "shards must be partitioning-invariant"
    # the shuffle must break ingest order: shard 0 is not just ids 0..k
    shard0 = {r["doc_id"] for r in a.where(F.col("shard") == 0).collect()}
    assert shard0 != set(range(len(shard0)))
    # budget respected up to one-doc overshoot
    per = a.groupBy("shard").agg(F.sum("tok").alias("t")).collect()
    assert all(r["t"] <= 50 + 7 for r in per)
