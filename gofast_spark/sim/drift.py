"""Embedding-distribution drift between two corpus slices.

The embedding-space analogue of the PSI check (quality/drift.py): when
a retrieval index or a training corpus is refreshed, compare the OLD
and NEW embedding distributions by their first two moments — the
cosine between mean vectors (directional shift), the mean-norm ratio
(scale shift), and the per-slice mean within-slice norm.  Cheap,
dimension-exact, and catches encoder-version skew / source-mix drift
long before recall metrics move.

Scale shape: ``posexplode`` turns each slice into (dim, value) pairs,
ONE dim-keyed groupBy produces the 2 x d mean vectors (map-side
combined — state is 2d doubles), and the comparison is a d-sized join
plus one final row.  Raw vectors are scanned once per slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mean_vec(df: DataFrame, vec_col: str) -> DataFrame:
    return (
        df.where(F.col(vec_col).isNotNull())
        .select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg(F.col("v").cast("double")).alias("m"),
             F.count(F.lit(1)).alias("n"))
    )


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
) -> DataFrame:
    """One row: ``(cos_means, norm_ratio, n_ref, n_cur)`` —
    ``cos_means`` the cosine between the two slices' mean vectors
    (1.0 = no directional drift), ``norm_ratio`` = |mean_cur| /
    |mean_ref|."""
    a = _mean_vec(ref, vec_col).select(
        "dim", F.col("m").alias("ma"), F.col("n").alias("na")
    )
    b = _mean_vec(cur, vec_col).select(
        "dim", F.col("m").alias("mb"), F.col("n").alias("nb")
    )
    j = a.join(b, "dim")
    return j.agg(
        (
            F.sum(F.col("ma") * F.col("mb"))
            / (
                F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
            )
        ).alias("cos_means"),
        (
            F.sqrt(F.sum(F.col("mb") * F.col("mb")))
            / F.sqrt(F.sum(F.col("ma") * F.col("ma")))
        ).alias("norm_ratio"),
        F.max("na").alias("n_ref"),
        F.max("nb").alias("n_cur"),
    )
