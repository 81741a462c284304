"""Deterministic negative sampling from the corpus unigram distribution.

The contrastive-training staple (word2vec skip-gram negative sampling,
Mikolov et al. NeurIPS 2013; the same draw feeds two-tower retrieval
and CLIP-style batches): for each anchor, draw k tokens with
probability proportional to corpus frequency.  This implementation is
REPRODUCIBLE by construction — the "randomness" is the repo's portable
md5 hash of (anchor id, draw index), so any engine, partitioning, or
rerun yields the identical negatives (the property a training-data
audit needs; Mikolov's 0.75 tempering can be applied upstream with the
temperature-mixture operator, keeping weights here exact integers).

Scale shape: the vocabulary (token, cumulative-count interval) table
comes from one explode + groupBy and a vocab-sized cumulative window;
draws map into the cumulative space by hash modulo total count, and
interval lookup is a JVM binary search (``Bucketizer`` over the
broadcast boundary array) — no range join, no per-row Python.  Vocab
size is bounded by ``top_v`` (frequency-ranked), matching word2vec's
practice of truncating the sampling table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text
from gofast_spark.text.hashing import md5_hash64


def negative_samples(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 2,
    top_v: int = 1_000,
) -> DataFrame:
    """``(id, draw, negative)`` — k frequency-proportional,
    hash-deterministic negative tokens per row id, drawn from the
    ``top_v`` most frequent corpus tokens (ties on count break by
    token, so the sampling table is canonical)."""
    if k < 1 or top_v < 2:
        raise ValueError("need k >= 1 and top_v >= 2")
    norm = normalize_text(text_col)
    toks = df.where(F.length(norm) > 0).select(
        F.split(norm, " ").alias("tk")
    )
    counts = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    head = counts.orderBy(F.col("n_w").desc(), "w").limit(top_v)
    wcum = Window.orderBy(F.col("n_w").desc(), "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    table = head.select(
        "w", F.sum("n_w").over(wcum).alias("hi")
    ).collect()  # vocab-sized driver table, the word2vec convention
    bounds = [0.0] + [float(r["hi"]) for r in table]
    vocab = [r["w"] for r in table]
    total = int(table[-1]["hi"])

    anchors = df.select(F.col(id_col).alias("id")).where(
        F.col(id_col).isNotNull()
    )
    draws = anchors.select(
        "id",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("draw"),
    ).withColumn(
        "__u",
        F.pmod(
            md5_hash64(
                F.concat_ws("#", F.col("id").cast("string"),
                            F.col("draw").cast("string"))
            ),
            F.lit(total),
        ).cast("double"),
    )
    from pyspark.ml.feature import Bucketizer

    b = Bucketizer(
        splits=bounds, inputCol="__u", outputCol="__idx",
        handleInvalid="keep",
    )
    idx_map = F.array(*[F.lit(w) for w in vocab])
    return (
        b.transform(draws)
        .select(
            "id",
            "draw",
            F.element_at(idx_map, F.col("__idx").cast("int") + 1).alias(
                "negative"
            ),
        )
    )
