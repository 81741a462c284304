"""Sequence packing for LLM training (concat-and-chunk).

The standard GPT-style data layout (public method — Brown et al. 2020
pack documents into a continuous token stream; T5/"packing" literature):
concatenate all documents in a deterministic order and cut the stream
into fixed-length training sequences of ``seq_len`` tokens.  A document
then occupies a SPAN of one or more sequences; the trainer reads, per
sequence, which documents compose it and at what offsets (for attention
masking across document boundaries).

Spark-first plan — fully relational, no sequential dependence:

1. global token offsets via :func:`gofast_spark.operators.prefix.
   distributed_cumsum` (two-phase parallel scan — no single-reducer
   window);
2. each doc's sequence range is pure arithmetic on its offset:
   ``first_seq = start // seq_len``, ``last_seq = (end-1) // seq_len``;
3. the doc -> sequence spans are an ``explode(sequence(first, last))`` —
   row-local fan-out, each span's in-sequence offsets again arithmetic.

Contrast with ``token_budget_shards`` (budget BINNING: docs never split,
shards overshoot): packing SPLITS docs at exact ``seq_len`` boundaries,
so every sequence except the stream's last holds exactly ``seq_len``
tokens — zero padding waste, the property trainers want.  Greedy
best-fit packing (no doc splits, minimal padding) has a sequential
dependence that does not distribute; concat-and-chunk is the standard
scalable layout.

At 100 TB the only shuffles are the range repartition inside the prefix
sum and the per-sequence aggregation if requested — both keyed,
partition-parallel, skew-free (sequence ids are uniform by
construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofast_spark.operators.prefix import distributed_cumsum


def pack_sequences(
    df: DataFrame,
    order_col: str,
    tokens_col: str | Column,
    *,
    seq_len: int,
    explode_spans: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-``seq_len`` training sequences.

    With ``explode_spans=True`` (default): one row per (doc, sequence)
    span — (``order_col``, ``seq_id``, ``span_begin``, ``span_tokens``)
    where ``span_begin`` is the span's offset INSIDE the sequence and
    ``span_tokens`` its length; ``groupBy(seq_id)`` reconstructs each
    training sequence's composition.  Zero-token docs occupy no span and
    are dropped from span output.

    With ``explode_spans=False``: one row per doc with its stream
    placement — (input columns, ``start_offset``, ``first_seq``,
    ``last_seq``, ``n_seqs``); zero-token docs keep ``n_seqs = 0``.

    ``order_col`` must be globally unique (the prefix-sum contract); the
    packing is deterministic in that order.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    tcol = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    tmp = df.withColumn("__tok", tcol.cast("bigint"))
    c = distributed_cumsum(
        tmp, order_col, "__tok", out_col="__cum",
        num_partitions=num_partitions,
    )
    start = F.col("__cum") - F.col("__tok")
    first = F.floor(start / seq_len)
    last = F.floor((F.col("__cum") - 1) / seq_len)
    if not explode_spans:
        return (
            c.withColumn("start_offset", start)
            .withColumn(
                "first_seq",
                F.when(F.col("__tok") > 0, first).cast("bigint"),
            )
            .withColumn(
                "last_seq",
                F.when(F.col("__tok") > 0, last).cast("bigint"),
            )
            .withColumn(
                "n_seqs",
                F.when(F.col("__tok") > 0, last - first + 1)
                .otherwise(F.lit(0))
                .cast("bigint"),
            )
            .drop("__tok", "__cum")
        )
    spans = (
        c.where(F.col("__tok") > 0)
        .withColumn("__start", start)
        .withColumn("seq_id", F.explode(F.sequence(first, last)))
    )
    seq_lo = F.col("seq_id") * seq_len
    span_abs_begin = F.greatest(F.col("__start"), seq_lo)
    span_abs_end = F.least(
        F.col("__start") + F.col("__tok"), seq_lo + seq_len
    )
    return spans.select(
        order_col,
        F.col("seq_id").cast("bigint"),
        (span_abs_begin - seq_lo).cast("bigint").alias("span_begin"),
        (span_abs_end - span_abs_begin).cast("bigint").alias("span_tokens"),
    )


def sequence_fill_stats(spans: DataFrame) -> DataFrame:
    """Per-sequence composition from :func:`pack_sequences` span output:
    (``seq_id``, ``n_docs``, ``n_tokens``).  Invariant: every sequence
    except the stream's last has ``n_tokens == seq_len`` exactly — the
    zero-padding-waste property of concat-and-chunk."""
    return spans.groupBy("seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("span_tokens").cast("bigint").alias("n_tokens"),
    )


def shuffled_token_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    *,
    budget: int,
    shard_col: str = "shard",
    cumsum_col: str | None = None,
) -> DataFrame:
    """Token-budget shards over a DETERMINISTIC global shuffle of the
    corpus: documents are ordered by an engine-portable md5 key of
    their id (plus the id as tiebreak) before budget binning, so shards
    mix sources/time instead of preserving ingest order — the standard
    pre-training requirement that each shard be an unbiased sample of
    the corpus.  Same run -> same shards on any cluster size (the key
    is a pure function of the id, never of partitioning).

    Scale shape: the md5 key is one codegen projection; ordering +
    running totals ride the two-phase distributed prefix scan of
    :func:`token_budget_shards` — range-repartition on the key,
    partition-local window, broadcast offsets; no single-reducer sort.
    """
    from gofast_spark.operators.prefix import token_budget_shards
    from gofast_spark.text.hashing import md5_hash64

    keyed = df.withColumn(
        "__shuf", md5_hash64(F.col(id_col).cast("string"))
    )
    out = token_budget_shards(
        keyed,
        ["__shuf", id_col],
        tokens_col,
        budget=budget,
        shard_col=shard_col,
        cumsum_col=cumsum_col,
    )
    return out.drop("__shuf")
