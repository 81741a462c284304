"""Catalog entries for the spatial family (SURVEY §2.3 dual_merge /
truncate_data, §2.9 spatial scalars).  Fixtures carry no lon/lat, so
coordinates derive deterministically from existing columns on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import _t, query

_D2 = "sqrt(pow(s.s_acctbal - c.c_acctbal, 2) + pow(s.s_nationkey - c.c_nationkey, 2))"


@query(
    "nearest_join_2d_acctbal",
    oracle=f"""
    SELECT s_suppkey, c_custkey, CAST(round(dist, 4) AS DOUBLE) AS dist
    FROM (
      SELECT s.s_suppkey, c.c_custkey, {_D2} AS dist,
             row_number() OVER (
               PARTITION BY s.s_suppkey ORDER BY {_D2}, c.c_custkey) AS rn
      FROM supplier s JOIN customer c
        ON abs(s.s_acctbal - c.c_acctbal) <= 2.0
       AND abs(s.s_nationkey - c.c_nationkey) <= 2.0
      WHERE {_D2} <= 2.0)
    WHERE rn = 1
    """,
)
def nearest_join_2d_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D euclidean nearest match via the 3x3-cell band join (dual_merge
    find_closest, gofast/utils/spatial_utils.py:2318); the oracle uses the
    naive range predicate, proving the grid join finds identical matches."""
    from gofast_spark.operators import nearest_join_2d

    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    out = nearest_join_2d(
        s, c, ("s_acctbal", "s_nationkey"), ("c_acctbal", "c_nationkey"),
        threshold=2.0, tiebreak="c_custkey", left_key="s_suppkey",
    )
    dist = F.sqrt(
        F.pow(F.col("s_acctbal") - F.col("c_acctbal"), 2)
        + F.pow(F.col("s_nationkey") - F.col("c_nationkey"), 2)
    )
    return out.select(
        "s_suppkey", "c_custkey", F.round(dist, 4).cast("double").alias("dist")
    )


@query(
    "truncate_customers_by_supplier",
    oracle="""
    SELECT c_custkey, c_acctbal, c_nationkey FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM supplier s
      WHERE round(s.s_acctbal, 0) = round(c.c_acctbal, 0)
        AND s.s_nationkey = c.c_nationkey)
    """,
)
def truncate_customers_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinate semi-join (truncate_data,
    gofast/utils/data_utils.py:2623) on rounded keys."""
    from gofast_spark.operators import truncate_data

    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    out = truncate_data(
        c, s, ["c_acctbal", "c_nationkey"],
        base_cols=["s_acctbal", "s_nationkey"], decimals=0,
    )
    return out.select("c_custkey", "c_acctbal", "c_nationkey")


@query(
    "haversine_bearing_nations",
    oracle="""
    WITH pts AS (
      SELECT n_nationkey AS k,
             CAST(n_nationkey * 3 - 30 AS DOUBLE) AS lat,
             CAST(n_nationkey * 7 - 80 AS DOUBLE) AS lon
      FROM nation)
    SELECT a.k AS k1, b.k AS k2,
           CAST(round(2 * 6371.0 * asin(sqrt(
             pow(sin(radians(b.lat - a.lat) / 2), 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3) AS DOUBLE) AS dist_km,
           CAST(round((degrees(atan2(
             sin(radians(b.lon - a.lon)) * cos(radians(b.lat)),
             cos(radians(a.lat)) * sin(radians(b.lat))
             - sin(radians(a.lat)) * cos(radians(b.lat)) * cos(radians(b.lon - a.lon))
           )) + 360) % 360, 3) AS DOUBLE) AS bearing
    FROM pts a JOIN pts b ON a.k < b.k
    """,
)
def haversine_bearing_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance + initial bearing between synthetic nation
    coordinates (get_distance/get_bearing,
    gofast/utils/spatial_utils.py:4790, 4975)."""
    from gofast_spark.functions.spatial import bearing_deg, haversine_km

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"),
        (F.col("n_nationkey") * 3 - 30).cast("double").alias("lat"),
        (F.col("n_nationkey") * 7 - 80).cast("double").alias("lon"),
    )
    a = n.select(F.col("k").alias("k1"), F.col("lat").alias("lat1"), F.col("lon").alias("lon1"))
    b = n.select(F.col("k").alias("k2"), F.col("lat").alias("lat2"), F.col("lon").alias("lon2"))
    pairs = a.join(b, F.col("k1") < F.col("k2"))
    return pairs.select(
        "k1",
        "k2",
        F.round(
            haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")), 3
        ).cast("double").alias("dist_km"),
        F.round(
            bearing_deg(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")), 3
        ).cast("double").alias("bearing"),
    )


@query(
    "euclidean_distance_nations",
    oracle="""
    WITH pts AS (
      SELECT n_nationkey AS k,
             CAST(n_nationkey * 3 AS DOUBLE) AS x,
             CAST(n_nationkey * 7 AS DOUBLE) AS y
      FROM nation)
    SELECT a.k AS k1, b.k AS k2,
           CAST(round(sqrt(pow(b.x - a.x, 2) + pow(b.y - a.y, 2)), 4)
                AS DOUBLE) AS dist
    FROM pts a JOIN pts b ON b.k = a.k + 1
    """,
)
def euclidean_distance_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planar distance scalar (get_distance is_latlon=False,
    gofast/utils/spatial_utils.py:4790) over consecutive synthetic
    nation points."""
    from gofast_spark.functions.spatial import euclidean_distance

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"),
        (F.col("n_nationkey") * 3).cast("double").alias("x"),
        (F.col("n_nationkey") * 7).cast("double").alias("y"),
    )
    b = n.select(
        F.col("k").alias("k2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    j = n.join(b, F.col("k2") == F.col("k") + 1)
    return j.select(
        F.col("k").alias("k1"),
        "k2",
        F.round(
            euclidean_distance(
                F.col("x"), F.col("y"), F.col("x2"), F.col("y2")
            ),
            4,
        ).cast("double").alias("dist"),
    )
