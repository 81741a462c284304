"""Named query catalog: every implemented operator gets a (Spark, oracle SQL)
pair the driver's correctness gate can hash-match against DuckDB (sf0.01).

Conventions that make the hash compare stable:
- every computed/aggregate column is aliased identically on both sides;
- double-valued aggregates are rounded to 4 decimals on both sides so
  summation-order float noise cannot flip the hash;
- sums of integers are cast to bigint on both sides (DuckDB sum(int) is
  HUGEINT); counts stay bigint;
- timestamps are truncated/cast to date or string when they appear in
  output.

Each Spark callable takes (spark, sf_dir) and returns a DataFrame.  The
implementations go through gofast_spark's public operators — the catalog is
also the engine's integration-test surface.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a catalog entry."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Flagship: revenue by region for shipped lineitems (SURVEY §7.1.1)
# Semantics of Frames.merge (gofast/dataops/core.py:622) + filter_df
# (gofast/utils/data_utils.py:1187) + smart_group w/ HAVING
# (gofast/dataops/transformation.py:663).
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue_by_region",
    oracle="""
    SELECT r_name AS region,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE l_returnflag <> 'R'
    GROUP BY r_name
    HAVING count(*) > 10
    ORDER BY revenue DESC
    """,
)
def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gofast_spark.operators import filter_df

    lineitem = filter_df(_t(spark, sf_dir, "lineitem"), "l_returnflag", "!=", "R")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    # dimension chain is tiny at any SF -> broadcast it into the fact scan
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
    )
    out = (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .where(F.col("n_items") > 10)
        .orderBy(F.col("revenue").desc())
    )
    return out
