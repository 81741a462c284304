"""Brute-force cosine top-k — the ANN correctness baseline.

Dot products and norms are ``zip_with``/``aggregate`` folds over the
``array<float>`` column (whole-stage codegen; elements cast to double
before multiply so both engines accumulate the same values in the same
left-to-right order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns."""
    return _dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k nearest corpus vectors per query vector, by cosine.

    The query set is broadcast (it is small by contract — this is the
    "given Q probes, scan the corpus once" shape), so the plan is a
    broadcast nested-loop join: one pass over the corpus, no shuffle of
    the corpus itself; only the per-query top-k candidates shuffle into
    the rank window.  For query sets too big to broadcast, use
    :func:`gofast_spark.sim.lsh_topk`.

    Output: (query_id, id, cos_sim, rank), rank 1..k per query.
    Determinism: rank orders by cosine rounded to 6 decimals, ties broken
    by corpus id ascending.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    pairs = corpus.join(F.broadcast(q), how="cross")
    if exclude_self:
        pairs = pairs.where(F.col(id_col) != F.col("query_id"))
    pairs = pairs.withColumn(
        "cos_sim", cosine_sim(F.col("__qv"), F.col(vec_col))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_sim"), 6).desc(), F.col(id_col).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", "rank")
    )
