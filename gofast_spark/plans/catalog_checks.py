"""Catalog entries for the §2.2/§2.4 leftover rows: positional filters,
sub-frame extraction, confidence ratios, interval coverage, soft bin
stats, and the net-new ROLLUP surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import _MONEY2_SQL, _U6_SQL, _t, query


@query(
    "filter_position_customers",
    oracle="""
    SELECT c_custkey, c_acctbal, c_nationkey FROM customer
    WHERE c_acctbal BETWEEN 0 AND 5000 AND c_nationkey BETWEEN 5 AND 15
    """,
)
def filter_position_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinate-range row selection (filter_position,
    gofast/utils/spatial_utils.py:1813)."""
    from gofast_spark.operators.checks import filter_position

    c = _t(spark, sf_dir, "customer")
    out = filter_position(
        c, x_col="c_acctbal", y_col="c_nationkey",
        x_range=(0, 5000), y_range=(5, 15),
    )
    return out.select("c_custkey", "c_acctbal", "c_nationkey")


@query(
    "data_extractor_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'F'
      AND o_totalprice BETWEEN 100000 AND 300000
      AND o_orderpriority IN ('1-URGENT', '5-LOW')
    """,
)
def data_extractor_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-frame extraction by mixed conditions (data_extractor,
    gofast/utils/data_utils.py:4451)."""
    from gofast_spark.operators.checks import data_extractor

    o = _t(spark, sf_dir, "orders")
    return data_extractor(
        o,
        columns=["o_orderkey", "o_totalprice"],
        conditions={
            "o_orderstatus": "F",
            "o_totalprice": (100000, 300000),
            "o_orderpriority": ["1-URGENT", "5-LOW"],
        },
    )


@query(
    "confidence_ratio_events",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN value < 30 THEN NULL ELSE value END AS v, user_id
      FROM events)
    SELECT 'v' AS column,
           CAST(count(v) AS DOUBLE) / count(*) AS ratio FROM t
    UNION ALL
    SELECT 'user_id', CAST(count(user_id) AS DOUBLE) / count(*) FROM t
    """,
)
def confidence_ratio_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-NULL fraction per column (get_confidence_ratio,
    gofast/core/utils.py:2095)."""
    from gofast_spark.operators.checks import get_confidence_ratio

    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("value") < 30, None).otherwise(F.col("value")).alias("v"),
        "user_id",
    )
    return get_confidence_ratio(e, ["v", "user_id"])


@query(
    "coverage_orders",
    oracle="""
    WITH t AS (
      SELECT o_totalprice AS y,
             o_totalprice * 0.8 AS lo,
             CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice * 0.9 END AS hi
      FROM orders)
    SELECT CAST(round(avg(CAST(y >= lo AND y <= hi AS DOUBLE)), 6) AS DOUBLE) AS coverage,
           count(y) AS n
    FROM t
    """,
)
def coverage_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prediction-interval coverage rate (compute_coverage,
    gofast/utils/mathext.py:925)."""
    from gofast_spark.operators.checks import compute_coverage

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("y"),
        (F.col("o_totalprice") * 0.8).alias("lo"),
        F.when(
            F.col("o_orderkey") % 2 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice") * 0.9).alias("hi"),
    )
    out = compute_coverage(o, "y", "lo", "hi")
    return out.select(
        F.round("coverage", 6).cast("double").alias("coverage"), "n"
    )


@query(
    "soft_bin_stat_orders",
    oracle="""
    WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 5)), 4) AS INTEGER) AS bin,
           count(*) AS n,
           CAST(round(avg(CAST(o_orderpriority = '1-URGENT' AS DOUBLE)), 6) AS DOUBLE)
             AS target_rate
    FROM orders, s GROUP BY 1
    """,
)
def soft_bin_stat_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin target rate (soft_bin_stat,
    gofast/utils/base_utils.py:4812)."""
    from gofast_spark.operators.checks import soft_bin_stat

    o = _t(spark, sf_dir, "orders").withColumn(
        "is_urgent", (F.col("o_orderpriority") == "1-URGENT").cast("int")
    )
    out = soft_bin_stat(o, "o_totalprice", "is_urgent", bins=5)
    return out.select(
        "bin", "n", F.round("target_rate", 6).cast("double").alias("target_rate")
    )


@query(
    "rollup_revenue_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='o_totalprice')})")}
             AS o_totalprice_sum,
           count(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals — Spark-native grouping-sets surface the reference
    lacks (SURVEY §2.4 'not present').  Micro-unit exact-money policy
    (see catalog._units6)."""
    from gofast_spark.operators.checks import cube_aggregate
    from gofast_spark.plans.catalog import _money2, _units6

    o = _t(spark, sf_dir, "orders").withColumn(
        "__p", _units6(F.col("o_totalprice"))
    )
    out = cube_aggregate(
        o,
        ["o_orderstatus", "o_orderpriority"],
        {"__p": "sum", "o_orderkey": "count"},
        mode="rollup",
    )
    return out.select(
        "o_orderstatus",
        "o_orderpriority",
        _money2(F.col("__p_sum")).alias("o_totalprice_sum"),
        F.col("o_orderkey_count").alias("n"),
    )


@query(
    "cube_revenue_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='o_totalprice')})")}
             AS o_totalprice_sum,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 4 grouping sets in one pass
    (partial aggregation expands grouping ids map-side, one shuffle).
    Companion to rollup_revenue_orders; SURVEY §2.4 promised grouping
    sets as Spark-native new surface.  Micro-unit exact-money policy
    (see catalog._units6)."""
    from gofast_spark.operators.checks import cube_aggregate
    from gofast_spark.plans.catalog import _money2, _units6

    o = _t(spark, sf_dir, "orders").withColumn(
        "__p", _units6(F.col("o_totalprice"))
    )
    out = cube_aggregate(
        o,
        ["o_orderstatus", "o_orderpriority"],
        {"__p": "sum", "o_orderkey": "count"},
        mode="cube",
    )
    return out.select(
        "o_orderstatus",
        "o_orderpriority",
        _money2(F.col("__p_sum")).alias("o_totalprice_sum"),
        F.col("o_orderkey_count").alias("n"),
    )


@query(
    "salted_agg_events_type",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(value), 4) AS DOUBLE) AS value_sum,
           CAST(round(avg(value), 6) AS DOUBLE) AS value_avg
    FROM events GROUP BY event_type
    """,
)
def salted_agg_events_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on the (low-cardinality, hence
    skew-prone) event_type key: (key, salt) partials then per-key
    combine.  The oracle is the plain GROUP BY — the rewrite must be
    value-identical, proving the skew path is safe to substitute at
    scale."""
    from gofast_spark.operators import salted_group_agg

    e = _t(spark, sf_dir, "events")
    out = salted_group_agg(
        e,
        "event_type",
        [("*", "count"), ("value", "sum"), ("value", "avg")],
        salt=8,
    )
    return out.select(
        "event_type",
        F.col("n"),
        F.round("value_sum", 4).cast("double").alias("value_sum"),
        F.round("value_avg", 6).cast("double").alias("value_avg"),
    )


@query(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='o_totalprice')})")}
             AS o_totalprice_sum,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — per-status totals, per-priority totals,
    and the grand total in ONE scan/shuffle (cube_aggregate
    mode='sets'), completing the §2.4 grouping-sets family beside
    cube/rollup."""
    from gofast_spark.operators.checks import cube_aggregate
    from gofast_spark.plans.catalog import _money2, _units6

    o = _t(spark, sf_dir, "orders").withColumn(
        "__p", _units6(F.col("o_totalprice"))
    )
    out = cube_aggregate(
        o,
        ["o_orderstatus", "o_orderpriority"],
        {"__p": "sum", "o_orderkey": "count"},
        mode="sets",
        sets=[["o_orderstatus"], ["o_orderpriority"], []],
    )
    return out.select(
        "o_orderstatus",
        "o_orderpriority",
        _money2(F.col("__p_sum")).alias("o_totalprice_sum"),
        F.col("o_orderkey_count").alias("n"),
    )
