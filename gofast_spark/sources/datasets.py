"""Frame construction + synthetic dataset generators (SURVEY §2.1).

Reference: ``build_df``/``make_df`` (gofast/utils/data_utils.py:944,
gofast/utils/base_utils.py:6057) and the ``gofast.datasets`` ``make_*``
family (gofast/datasets/make.py:70-3886).

Generators are ``spark.range`` + column expressions — fully distributed
(a billion-row synthetic table never touches the driver), seeded, and
schema-stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_df(
    spark: SparkSession,
    data,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Construct a DataFrame from dict/list/ndarray driver data
    (build_df, gofast/utils/data_utils.py:944).  Driver-side by contract —
    for big data use the readers or generators."""
    import pandas as pd

    if isinstance(data, dict):
        pdf = pd.DataFrame(data)
    elif isinstance(data, pd.DataFrame):
        pdf = data
    else:
        pdf = pd.DataFrame(list(data), columns=list(columns) if columns else None)
    if columns is not None and list(pdf.columns) != list(columns):
        pdf.columns = list(columns)
    return spark.createDataFrame(pdf)


make_df = build_df  # reference alias (gofast/utils/base_utils.py:6057)


def make_regression_data(
    spark: SparkSession,
    n_samples: int = 1000,
    n_features: int = 5,
    *,
    noise: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Linear-model synthetic data (make_regression flavor,
    gofast/datasets/make.py): features ~ N(0,1), target = sum(w_i * x_i)
    + noise with deterministic integer weights."""
    df = spark.range(n_samples)
    feats = []
    for i in range(n_features):
        df = df.withColumn(f"x_{i}", F.randn(seed + i))
        feats.append(F.col(f"x_{i}") * float(i + 1))
    target = sum(feats[1:], feats[0]) + F.randn(seed + 1000) * noise
    return df.withColumn("y", target).withColumnRenamed("id", "sample_id")


def make_classification_data(
    spark: SparkSession,
    n_samples: int = 1000,
    n_features: int = 5,
    *,
    n_classes: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Clustered-class synthetic data: class-dependent feature shift."""
    df = spark.range(n_samples).withColumn(
        "label", F.pmod(F.col("id"), F.lit(n_classes)).cast("int")
    )
    for i in range(n_features):
        df = df.withColumn(
            f"x_{i}", F.randn(seed + i) + F.col("label") * 2.0
        )
    return df.withColumnRenamed("id", "sample_id")


def make_sales_data(
    spark: SparkSession,
    n_rows: int = 10_000,
    *,
    n_stores: int = 20,
    n_products: int = 100,
    start_date: str = "2024-01-01",
    seed: int = 42,
) -> DataFrame:
    """Retail-transactions synthetic table (make_sales flavor,
    gofast/datasets/make.py): store/product keys, date spine, price and
    quantity distributions — the usual fixture for group/agg/TS demos."""
    df = spark.range(n_rows).withColumnRenamed("id", "txn_id")
    return (
        df.withColumn("store_id", F.pmod(F.col("txn_id") * 7919, F.lit(n_stores)))
        .withColumn("product_id", F.pmod(F.col("txn_id") * 104729, F.lit(n_products)))
        .withColumn(
            "sale_date",
            F.date_add(F.lit(start_date), F.pmod(F.col("txn_id"), F.lit(365)).cast("int")),
        )
        .withColumn("quantity", (F.pmod(F.col("txn_id") * 31, F.lit(9)) + 1).cast("int"))
        .withColumn("unit_price", F.round(F.rand(seed) * 99.0 + 1.0, 2))
        .withColumn("revenue", F.round(F.col("quantity") * F.col("unit_price"), 2))
    )
