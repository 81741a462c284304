"""Point-in-interval range join (bucketed, never a cross product).

Joins a frame of points to a frame of ``[start, end]`` intervals on
containment — IP-range lookups, validity windows, price brackets.  A
naive inequality join compiles to a broadcast nested loop (O(n*m));
this implementation turns it into an equi-join:

1. pick a bucket width ``W``; an interval covers buckets
   ``floor(start/W) .. floor(end/W)`` (explode — fan-out is
   ``len/W + 1`` rows per interval, so choose ``W`` near the typical
   interval length to keep it ~2);
2. a point lives in exactly ONE bucket ``floor(x/W)``, so the
   bucket equi-join finds every covering interval exactly once — no
   dedup pass needed;
3. the residual ``start <= x <= end`` filter runs on the (small)
   bucket-matched candidates.

The join is hash-partitionable on the bucket key, AQE handles skewed
buckets, and cost scales with candidates-per-bucket instead of n*m.
Same band-join family as operators/joins.nearest_join (SURVEY §4.2.1);
the difference is asymmetric fan-out: intervals explode, points don't.
Compose left-outer semantics on top (anti-join the matched point ids)
— the primitive stays inner so it never needs a point identity column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_width: float,
) -> DataFrame:
    """All (point row, interval row) pairs with
    ``start <= point <= end`` (closed on both ends).

    Column-name collisions between the two frames are the caller's
    responsibility (select/alias first, as with any join).  Degenerate
    intervals with ``start > end`` match nothing.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = float(bucket_width)
    p = points.withColumn("__b", F.floor(F.col(point_col) / F.lit(w)))
    iv = intervals.where(F.col(start_col) <= F.col(end_col)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(w)),
                F.floor(F.col(end_col) / F.lit(w)),
            )
        ),
    )
    contained = (F.col(start_col) <= F.col(point_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    return p.join(iv, "__b").where(contained).drop("__b")
