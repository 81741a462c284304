"""Readers / writers + synthetic dataset generators (SURVEY §2.1)."""

from gofast_spark.sources.io import export_data, load_tables, read_data
from gofast_spark.sources.datasets import (
    build_df,
    make_classification_data,
    make_data,
    make_df,
    make_financial_market_trends,
    make_gadget_sales,
    make_medical_diagnosis,
    make_regression_data,
    make_retail_store,
    make_sales_data,
    make_water_demand,
)

__all__ = [
    "read_data",
    "export_data",
    "load_tables",
    "build_df",
    "make_df",
    "make_data",
    "make_regression_data",
    "make_classification_data",
    "make_sales_data",
    "make_financial_market_trends",
    "make_gadget_sales",
    "make_medical_diagnosis",
    "make_retail_store",
    "make_water_demand",
]
