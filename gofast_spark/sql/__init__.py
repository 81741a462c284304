"""SQL facade (SURVEY §3.1): DBAnalysis parity over Spark SQL."""

from gofast_spark.sql.dbanalysis import DBAnalysis

__all__ = ["DBAnalysis"]
