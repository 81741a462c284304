"""Catalog entries for the remaining untested SURVEY §2.1/§2.2/§2.7 rows:
the universal reader, inline frame construction, column selection /
sanitation, rename-convention swaps, Frames.add, and the deferred
boolean-algebra facade.  Each is a thin oracle-verified exercise of the
public operator."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import _t, query


@query(
    "read_data_nation",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def read_data_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal extension-dispatch reader on a parquet path with
    sanitize on (read_data, gofast/core/io.py:826) — the distributed
    native path, verified against a direct scan."""
    from gofast_spark.sources import read_data

    df = read_data(
        spark, os.path.join(sf_dir, "nation.parquet"), sanitize=True
    )
    return df.select("n_nationkey", "n_name", "n_regionkey")


@query(
    "build_df_inline",
    oracle="""
    SELECT * FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5),
                          (3, 'gamma', 3.5)) AS t(id, name, score)
    """,
)
def build_df_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-dict frame construction (build_df/make_df,
    gofast/utils/data_utils.py:944, base_utils.py:6057)."""
    from gofast_spark.sources import build_df

    return build_df(
        spark,
        {
            "id": [1, 2, 3],
            "name": ["alpha", "beta", "gamma"],
            "score": [1.5, 2.5, 3.5],
        },
    )


@query(
    "column_selector_regex",
    oracle="""
    SELECT c_name, c_nationkey FROM customer
    """,
)
def column_selector_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sklearn-style ColumnSelector with explicit names + regex pattern
    (ColumnSelector, gofast/transformers/feature_engineering.py:4950)."""
    from gofast_spark.operators.composite import ColumnSelector

    c = _t(spark, sf_dir, "customer")
    sel = ColumnSelector(["c_name"], pattern=r"nationkey$")
    return sel.fit_transform(c)


@query(
    "sanitize_frame_cols_customer",
    oracle="""
    SELECT c_custkey AS cust_key, c_acctbal AS acct_bal_usd FROM customer
    """,
)
def sanitize_frame_cols_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-name sanitation (sanitize_frame_cols,
    gofast/core/utils.py:1941): messy names -> lower snake_case."""
    from gofast_spark.sources.io import sanitize_columns

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("Cust Key"),
        F.col("c_acctbal").alias(" Acct-Bal (USD) "),
    )
    return sanitize_columns(c)


@query(
    "swap_ic_orders",
    oracle="""
    SELECT o_orderkey AS order_id, o_totalprice AS total FROM orders
    """,
)
def swap_ic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index/column convention swap as an explicit rename map (swap_ic,
    gofast/utils/data_utils.py:5543)."""
    from gofast_spark.operators.reshape import swap_ic

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return swap_ic(o, {"o_orderkey": "order_id", "o_totalprice": "total"})


@query(
    "frames_add_nation",
    oracle="""
    SELECT a.n_nationkey,
           CAST(a.n_regionkey + b.n_regionkey AS BIGINT) AS n_regionkey
    FROM nation a JOIN nation b ON a.n_nationkey = b.n_nationkey
    """,
)
def frames_add_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise keyed add across frames, NULL as 0 (Frames.add,
    reference gofast/dataops/core.py:656)."""
    from gofast_spark.core import Frames

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    out = Frames([n, n]).add("n_nationkey").execute()
    return out.select(
        "n_nationkey", F.col("n_regionkey").cast("bigint").alias("n_regionkey")
    )


@query(
    "bool_algebra_customers",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE (c_acctbal > 1000 AND c_mktsegment = 'BUILDING')
       OR NOT (c_nationkey < 20)
    """,
)
def bool_algebra_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deferred boolean algebra over predicates (MergeableSeries,
    reference gofast/dataops/core.py:439): & | ~ compose lazily and
    execute() yields the Catalyst predicate — pushdown-eligible."""
    from gofast_spark.core import MergeableSeries

    c = _t(spark, sf_dir, "customer")
    a = MergeableSeries(F.col("c_acctbal") > 1000)
    b = MergeableSeries(F.col("c_mktsegment") == "BUILDING")
    d = MergeableSeries(F.col("c_nationkey") < 20)
    pred = (a & b) | ~d
    return c.where(pred.execute()).select("c_custkey")
