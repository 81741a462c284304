"""TextRank keyword extraction over the corpus co-occurrence graph.

Public basis: Mihalcea & Tarau, "TextRank: Bringing Order into
Texts" (EMNLP 2004) — build a token graph from within-window
co-occurrence (window 2 = adjacent tokens here), run PageRank, rank
tokens by centrality.  This is the corpus-level variant: one graph
over ALL documents, so the hot path is exactly the bigram machinery
of :mod:`gofast_spark.text.cooccur` (one explode + one distinct per
corpus scan) feeding the shared :func:`gofast_spark.ml.graph.pagerank`
power iteration — vocabulary-sized state, never corpus-sized, and the
edge table is checkpointed once regardless of iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.ml.graph import pagerank
from gofast_spark.text.analysis import normalize_text

__all__ = ["textrank_keywords"]


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    *,
    iterations: int = 5,
    damping: float = 0.85,
    top_k: int = 20,
    min_token_len: int = 3,
) -> DataFrame:
    """Top-``top_k`` tokens by TextRank centrality: ``(token, rank)``.

    Tokens shorter than ``min_token_len`` characters are dropped BEFORE
    pairing (the Mihalcea-Tarau syntactic filter, approximated
    lexically — stopwords are overwhelmingly short), adjacency
    survives the drop only between retained neighbors.  Edges are the
    DISTINCT undirected adjacent-token pairs; ranks come from the
    shared synchronous PageRank.  Ordering ties break on the token so
    the cut is deterministic."""
    norm = normalize_text(text_col)
    toks = df.where(F.length(norm) > 0).select(
        F.filter(
            F.split(norm, " "),
            lambda t: F.length(t) >= F.lit(int(min_token_len)),
        ).alias("tk")
    ).where(F.size("tk") >= 2)
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("a"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("b"),
            )
        ).alias("bg")
    ).select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    edges = (
        pairs.where(F.col("a") != F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.where(F.col("a") != F.col("b")).select(
                F.col("b").alias("src"), F.col("a").alias("dst")
            )
        )
        .distinct()
    )
    r = pagerank(
        edges, iterations=iterations, damping=damping, broadcast_ranks=True
    )
    return (
        r.select(F.col("node").alias("token"), "rank")
        .orderBy(F.round("rank", 8).desc(), "token")
        .limit(top_k)
    )
