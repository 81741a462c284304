"""Random-hyperplane LSH for bucketed (approximate) nearest-neighbor search.

Each vector gets a ``bits``-wide bucket id: bit j is the sign of the dot
product with a deterministic pseudo-random integer hyperplane
``w_j[i] = ((j*dim+i)*A + C) mod M - M/2`` (the LCG from
``operators/sampling``).  Cosine-similar vectors agree on most signs
(Goemans-Williamson / Charikar), so near neighbors collide in buckets and
candidate generation becomes an equi-join on the bucket id — the scale
path the builder brief asks for (IVF/LSH-bucketed, not all-pairs).

Integer hyperplanes make the bucket computation reproducible in DuckDB:
the dot products have magnitude ~1e8 against float rounding error ~1e-7,
so the sign (and therefore every bucket id) matches across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gofast_spark.sim.cosine import cosine_sim, l2_norm

LSH_A = 1103515245
LSH_C = 12345
LSH_M = 2**31


def hyperplane_weight(j: int, i: int) -> int:
    """Integer weight of hyperplane ``j`` at dimension ``i`` (pure Python —
    the same literal feeds the Spark plan and the DuckDB oracle)."""
    return ((j * 4099 + i) * LSH_A + LSH_C) % LSH_M - LSH_M // 2


def hyperplane_bucket(vec: Column, *, dim: int, bits: int = 4) -> Column:
    """Bucket id (0 .. 2^bits-1) of an array column under ``bits``
    deterministic hyperplanes.  Pure column expressions — evaluated inline
    during the scan, no shuffle."""
    bucket = F.lit(0)
    for j in range(bits):
        dot = F.lit(0.0)
        for i in range(dim):
            dot = dot + vec[i].cast("double") * F.lit(float(hyperplane_weight(j, i)))
        bucket = bucket + F.when(dot >= 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket


def _probe_buckets(vec: Column, *, dim: int, bits: int, probes: int) -> Column:
    """Array of bucket ids to probe for a query vector: its own bucket plus
    ``probes`` neighbors at Hamming distance 1, flipping the bits whose
    hyperplane dot product is smallest in magnitude (the least-confident
    signs — standard multi-probe LSH).  Query-side-only column arithmetic:
    the corpus is still bucketed once, so the candidate join stays an
    equi-join; multi-probe just explodes each query into ``probes+1`` rows.
    """
    dots = []
    for j in range(bits):
        d = F.lit(0.0)
        for i in range(dim):
            d = d + vec[i].cast("double") * F.lit(float(hyperplane_weight(j, i)))
        dots.append(d)
    bucket = F.lit(0)
    for j in range(bits):
        bucket = bucket + F.when(dots[j] >= 0, F.lit(2**j)).otherwise(F.lit(0))
    # hyperplane indices ordered by |dot| ascending (least-confident first)
    order = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(dots[j]).alias("a"), F.lit(j).alias("j"))
                for j in range(bits)
            ]
        )
    )
    powers = F.array(*[F.lit(1 << j) for j in range(bits)])
    flips = [
        bucket.bitwiseXOR(F.element_at(powers, order[p]["j"] + 1))
        for p in range(min(probes, bits))
    ]
    return F.array(bucket, *flips)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    bits: int = 4,
    k: int = 5,
    probes: int = 0,
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Join is an equi-join on the bucket id (hash-partitionable; bucket
    count 2^bits caps the fan-out).  At cluster scale, repartition the
    corpus by bucket once and reuse across query batches.  Recall is
    tunable via ``bits`` (fewer bits -> bigger buckets -> higher recall,
    more compute) and ``probes`` (extra Hamming-1 buckets probed per
    query, flipping the least-confident hyperplane signs).

    Output: (query_id, id, bucket, cos_sim, rank).
    """
    qid = query_id_col or id_col
    # norms hoisted below the bucket join: once per row, not per pair
    # (r15 — see cosine_sim)
    c = corpus.withColumn(
        "bucket", hyperplane_bucket(F.col(vec_col), dim=dim, bits=bits)
    ).withColumn("__cn", l2_norm(F.col(vec_col)))
    if probes > 0:
        q = queries.select(
            F.col(qid).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__qn"),
            F.explode(
                F.array_distinct(
                    _probe_buckets(F.col(vec_col), dim=dim, bits=bits, probes=probes)
                )
            ).alias("bucket"),
        )
    else:
        q = queries.select(
            F.col(qid).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__qn"),
            hyperplane_bucket(F.col(vec_col), dim=dim, bits=bits).alias("bucket"),
        )
    pairs = c.join(F.broadcast(q), on="bucket")
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
        .select("query_id", id_col, "bucket", "cos_sim", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    threshold: float = 0.9,
    bits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with LSH bucket blocking —
    the embedding analog of ``dedup.near_dup_pairs`` (shingle Jaccard),
    completing the near-dup family: exact / MinHash / SimHash / cosine.

    Candidate generation is the bucket self-join (equi-join on the
    hyperplane bucket id, ``id_a < id_b`` to halve the pairs); the exact
    cosine then filters candidates.  Never all-pairs: pair count is
    bounded by the largest bucket, and raising ``bits`` shrinks buckets.
    Recall trades off identically to :func:`lsh_topk` (a true near-dup
    pair split across buckets is missed; near-identical vectors agree on
    every hyperplane sign with probability ``1 - theta/pi`` per bit).

    Output: (id_a, id_b, bucket, cos_sim).
    """
    # per-row norm below the self-join: once per row, not per pair
    # (r15 — see cosine_sim)
    b = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bucket(F.col(vec_col), dim=dim, bits=bits).alias("bucket"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    left = b.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        "bucket",
        F.col("__n").alias("__na"),
    )
    right = b.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        "bucket",
        F.col("__n").alias("__nb"),
    )
    pairs = left.join(right, on="bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cos_sim",
            cosine_sim(
                F.col("__va"),
                F.col("__vb"),
                norm_a=F.col("__na"),
                norm_b=F.col("__nb"),
            ),
        )
        .where(F.round(F.col("cos_sim"), 6) >= threshold)
        .select("id_a", "id_b", "bucket", "cos_sim")
    )
