"""Query catalog: named (Spark query, DuckDB oracle SQL) pairs."""

from gofast_spark.plans.catalog import QUERIES, ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]
