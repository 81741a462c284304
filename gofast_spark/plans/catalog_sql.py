"""Catalog entries exercising the DBAnalysis SQL facade (SURVEY §3.1).

The facade SQL is written in the ANSI subset both Catalyst and DuckDB
parse identically, so each entry passes the SAME string to Spark (via
``DBAnalysis``) and to the oracle — the strongest possible parity check
for the SQL path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gofast_spark.plans.catalog import _t, query

_AGG_SQL = """
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           CAST(ROUND(AVG(s_acctbal), 4) AS DOUBLE) AS avg_acctbal,
           CAST(ROUND(SUM(s_acctbal), 2) AS DOUBLE) AS sum_acctbal
    FROM supplier
    GROUP BY s_nationkey
"""

_JOIN_SQL = """
    SELECT n_name,
           COUNT(*) AS n_suppliers,
           CAST(ROUND(MIN(s_acctbal), 2) AS DOUBLE) AS min_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
"""

_WINDOW_SQL = """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders) t
    WHERE rn <= 2
"""


def _facade(spark: SparkSession, sf_dir: str, tables: list[str]):
    from gofast_spark.sql import DBAnalysis

    return DBAnalysis(spark).fit({t: _t(spark, sf_dir, t) for t in tables})


@query("sql_facade_aggregate", oracle=_AGG_SQL)
def sql_facade_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBAnalysis.aggregate (gofast/query.py:267) — same SQL string runs
    on Catalyst and on the DuckDB oracle."""
    return _facade(spark, sf_dir, ["supplier"]).aggregate(_AGG_SQL)


@query("sql_facade_join", oracle=_JOIN_SQL)
def sql_facade_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBAnalysis.joinTables (gofast/query.py:327)."""
    return _facade(spark, sf_dir, ["supplier", "nation"]).joinTables(_JOIN_SQL)


@query("sql_facade_window", oracle=_WINDOW_SQL)
def sql_facade_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBAnalysis.windowFunctions (gofast/query.py:639)."""
    return _facade(spark, sf_dir, ["orders"]).windowFunctions(_WINDOW_SQL)


@query(
    "sql_facade_dml",
    oracle="""
    WITH after_insert AS (
      SELECT r_regionkey, r_name FROM region
      UNION ALL SELECT 99, 'ATLANTIS'
    ), after_update AS (
      SELECT r_regionkey,
             CASE WHEN r_regionkey = 0 THEN 'AFRICA_X' ELSE r_name END AS r_name
      FROM after_insert
    )
    SELECT r_regionkey, r_name FROM after_update WHERE r_regionkey <> 2
    """,
)
def sql_facade_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBAnalysis.manipulate/commit (gofast/query.py:488,538): INSERT,
    UPDATE and DELETE compiled to view rewrites, staged as one
    transaction; the oracle replays the same statements as pure SQL set
    operations on DuckDB — final states must hash-match."""
    from gofast_spark.sql import DBAnalysis

    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    db = DBAnalysis(spark).fit(r, "dml_region")
    db.manipulate(
        "INSERT INTO dml_region VALUES (99, 'ATLANTIS')", auto_commit=False
    )
    db.manipulate(
        "UPDATE dml_region SET r_name = 'AFRICA_X' WHERE r_regionkey = 0",
        auto_commit=False,
    )
    db.manipulate("DELETE FROM dml_region WHERE r_regionkey = 2", auto_commit=False)
    db.commit()
    return db.query("SELECT r_regionkey, r_name FROM dml_region")
