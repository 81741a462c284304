"""Readers / writers (SURVEY §2.1)."""

from gofast_spark.sources.io import export_data, load_tables, read_data

__all__ = ["read_data", "export_data", "load_tables"]
