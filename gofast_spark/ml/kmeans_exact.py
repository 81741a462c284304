"""Engine-portable exact k-means (Lloyd 1982), integer micro-unit state.

MLlib's KMeans (used by ``ml/pipeline.py fit_kmeans`` and the IVF
coarse quantizer) is fast but not oracle-replayable: its init and float
reductions are implementation-defined.  This variant makes every step a
pure function of the data so a SQL engine reproduces it bit-for-bit —
the from-scratch companion to the parked rows-only MLlib entries:

- coordinates quantize to integer micro-units (``floor(x*1e6 + 0.5)``,
  sign-correct round-half-up) — distances and centroid sums are exact
  64-bit integer arithmetic, immune to float reduction order;
- init is the k rows with the LOWEST portable md5 hash of their id
  (the seeded-landmark convention of ``ml/dimensionality.py``);
- assignment ties break by smallest centroid id; centroid updates are
  TRUNCATED integer means.

Scale shape per iteration: one broadcast of k centroid rows, one
``min_by`` argmin per point (no k-way shuffle blow-up — the cross join
is k-row broadcast nested loop), one groupBy(k) update.  Empty
clusters keep their previous centroid (standard Lloyd fallback).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofast_spark.text.hashing import md5_hash64

_U = 1_000_000


def fit_kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    dim_cols: Sequence[str],
    k: int,
    *,
    iterations: int = 2,
) -> DataFrame:
    """Run ``iterations`` exact Lloyd steps; returns the final
    centroids ``(cid, c0_u6.., n_points)`` with coordinates in integer
    micro-units (divide by 1e6 to use) and the size of each cluster
    after the LAST assignment."""
    dims = list(dim_cols)
    d = len(dims)
    if k < 2 or d < 1 or iterations < 1:
        raise ValueError("need k >= 2, >= 1 dim, iterations >= 1")
    cols = [
        F.floor(F.col(c).cast("double") * _U + F.lit(0.5))
        .cast("bigint")
        .alias(f"x{i}")
        for i, c in enumerate(dims)
    ]
    pts = df.select(
        F.col(id_col).alias("__id"),
        md5_hash64(F.col(id_col).cast("string")).alias("__hv"),
        *cols,
    ).where(F.col("__id").isNotNull())

    wseed = Window.orderBy("__hv")
    cent = (
        pts.orderBy("__hv")
        .limit(k)
        .withColumn("cid", F.row_number().over(wseed) - 1)
        .select("cid", *[F.col(f"x{i}").alias(f"c{i}") for i in range(d)])
    )
    dist = None
    for i in range(d):
        t = F.col(f"x{i}") - F.col(f"c{i}")
        dist = t * t if dist is None else dist + t * t
    for _ in range(iterations):
        assigned = (
            pts.crossJoin(
                F.broadcast(cent.select("cid", *[f"c{i}" for i in range(d)]))
            )
            .groupBy("__id", *[f"x{i}" for i in range(d)])
            .agg(
                F.min_by(
                    "cid", F.struct(dist.alias("d"), F.col("cid"))
                ).alias("cid")
            )
        )
        upd = assigned.groupBy("cid").agg(
            *[
                (F.sum(f"x{i}").cast("double") / F.count(F.lit(1)))
                .cast("bigint")
                .alias(f"u{i}")
                for i in range(d)
            ],
            F.count(F.lit(1)).alias("n_points"),
        )
        # empty clusters keep their previous centroid (n_points = 0)
        cent = (
            cent.select("cid", *[f"c{i}" for i in range(d)])
            .join(F.broadcast(upd), "cid", "left")
            .select(
                "cid",
                *[
                    F.coalesce(F.col(f"u{i}"), F.col(f"c{i}")).alias(f"c{i}")
                    for i in range(d)
                ],
                F.coalesce(F.col("n_points"), F.lit(0)).alias("n_points"),
            )
        )
    return cent.select(
        "cid", *[F.col(f"c{i}").alias(f"c{i}_u6") for i in range(d)],
        "n_points",
    )


def kmeans_inertia(
    df: DataFrame,
    id_col: str,
    dim_cols: Sequence[str],
    centroids: DataFrame,
) -> DataFrame:
    """Within-cluster sum of squared distances to the given centroids
    (the elbow-curve statistic), exact: coordinates and centroids are
    integer micro-units, so the per-point min distance and the global
    sum are 64-bit-integer arithmetic with no reduction-order effects.
    ``centroids`` is a ``fit_kmeans_lloyd`` result (``cid, c{i}_u6``).
    Returns 1 row ``(inertia_uu, n_points)`` — inertia in SQUARED
    micro-units (divide by 1e12 for the real-unit value)."""
    dims = list(dim_cols)
    d = len(dims)
    cols = [
        F.floor(F.col(c).cast("double") * _U + F.lit(0.5))
        .cast("bigint")
        .alias(f"x{i}")
        for i, c in enumerate(dims)
    ]
    pts = df.select(F.col(id_col).alias("__id"), *cols).where(
        F.col("__id").isNotNull()
    )
    cent = centroids.select(
        "cid", *[F.col(f"c{i}_u6").alias(f"c{i}") for i in range(d)]
    )
    dist = None
    for i in range(d):
        t = F.col(f"x{i}") - F.col(f"c{i}")
        dist = t * t if dist is None else dist + t * t
    per_point = (
        pts.crossJoin(F.broadcast(cent))
        .groupBy("__id")
        .agg(F.min(dist).alias("__d"))
    )
    return per_point.agg(
        F.sum("__d").alias("inertia_uu"),
        F.count(F.lit(1)).alias("n_points"),
    )


def simplified_silhouette(
    df: DataFrame,
    id_col: str,
    dim_cols: Sequence[str],
    centroids: DataFrame,
) -> DataFrame:
    """Per-cluster mean SIMPLIFIED silhouette (Rousseeuw, JCAM 1987;
    the centroid-based simplification of Hruschka et al. 2004 —
    distances to centroids, not all point pairs, so the cost is
    points x k instead of points^2):

        s_i = (b_i - a_i) / max(a_i, b_i)

    with ``a`` the distance to the assigned centroid and ``b`` the
    nearest OTHER centroid.  Distances are exact integer micro-unit
    squares (the `kmeans_inertia` arithmetic); each ``s_i`` is
    quantized to nano-units so the per-cluster means are exact.
    ``centroids`` is a ``fit_kmeans_lloyd`` result.  Output: ``(cid,
    n, mean_silhouette)``."""
    dims = list(dim_cols)
    d = len(dims)
    cols = [
        F.floor(F.col(c).cast("double") * _U + F.lit(0.5))
        .cast("bigint")
        .alias(f"x{i}")
        for i, c in enumerate(dims)
    ]
    pts = df.select(F.col(id_col).alias("__id"), *cols).where(
        F.col("__id").isNotNull()
    )
    cent = centroids.select(
        "cid", *[F.col(f"c{i}_u6").alias(f"c{i}") for i in range(d)]
    )
    dist = None
    for i in range(d):
        t = F.col(f"x{i}") - F.col(f"c{i}")
        dist = t * t if dist is None else dist + t * t
    j = pts.crossJoin(F.broadcast(cent))
    asg = j.groupBy("__id").agg(
        F.min(F.struct(dist.alias("d2"), F.col("cid"))).alias("__m")
    ).select(
        "__id",
        F.col("__m.d2").alias("__a2"),
        F.col("__m.cid").alias("__own"),
    )
    b = (
        j.join(F.broadcast(asg.select("__id", "__own")), "__id")
        .where(F.col("cid") != F.col("__own"))
        .groupBy("__id")
        .agg(F.min(dist).alias("__b2"))
    )
    a_d = F.sqrt(F.col("__a2").cast("double")) / F.lit(float(_U))
    b_d = F.sqrt(F.col("__b2").cast("double")) / F.lit(float(_U))
    su = F.floor(
        (b_d - a_d) / F.greatest(a_d, b_d) * F.lit(1e9) + F.lit(0.5)
    ).cast("bigint")
    s = asg.join(b, "__id").select(F.col("__own").alias("cid"),
                                   su.alias("__su"))
    return s.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("__su").cast("double") / F.lit(1e9)
         / F.count(F.lit(1)).cast("double")).alias("mean_silhouette"),
    )
