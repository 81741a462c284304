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


def cosine_sim(
    a: Column,
    b: Column,
    *,
    norm_a: Column | None = None,
    norm_b: Column | None = None,
) -> Column:
    """Cosine similarity of two array columns.

    ``norm_a``/``norm_b`` accept PRECOMPUTED L2 norms (r15, guide §1.2
    per-task work): inside a pair join the norm folds otherwise
    re-evaluate per PAIR — hoisting them to per-row projections below
    the join computes each exactly once per row.  Values are identical
    (same operand order, same doubles)."""
    na = norm_a if norm_a is not None else l2_norm(a)
    nb = norm_b if norm_b is not None else l2_norm(b)
    return _dot(a, b) / (na * nb)


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
    # norms hoisted below the join: once per query row / corpus row
    # instead of once per PAIR (r15 — see cosine_sim)
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    pairs = corpus.withColumn("__cn", l2_norm(F.col(vec_col))).join(
        F.broadcast(q), how="cross"
    )
    if exclude_self:
        pairs = pairs.where(F.col(id_col) != F.col("query_id"))
    pairs = pairs.withColumn(
        "cos_sim",
        cosine_sim(
            F.col("__qv"),
            F.col(vec_col),
            norm_a=F.col("__qn"),
            norm_b=F.col("__cn"),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos_sim"), 6).desc(), F.col(id_col).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", "rank")
    )
