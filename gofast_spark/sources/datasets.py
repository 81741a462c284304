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


def _pick(col, choices: Sequence[str]):
    """Deterministic category pick: pmod over a hashed id — pure column
    expression, no UDF."""
    expr = F.pmod(F.xxhash64(col), F.lit(len(choices)))
    out = F.lit(choices[0])
    for i, c in enumerate(choices[1:], start=1):
        out = F.when(expr == i, F.lit(c)).otherwise(out)
    return out


def make_data(
    spark: SparkSession,
    n_samples: int = 100,
    n_features: int = 5,
    *,
    task: str = "classification",
    n_classes: int = 2,
    noise: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Generic task-switch generator (make_data,
    gofast/datasets/make.py:539): classification or regression flavor."""
    if task == "classification":
        return make_classification_data(
            spark, n_samples, n_features, n_classes=n_classes, seed=seed
        )
    return make_regression_data(
        spark, n_samples, n_features, noise=noise or 0.1, seed=seed
    )


def make_financial_market_trends(
    spark: SparkSession,
    samples: int = 1000,
    *,
    n_symbols: int = 1,
    base_price: float = 100.0,
    trend_strength: float = 0.03,
    price_noise_level: float = 0.01,
    start_date: str = "2024-01-02",
    seed: int = 42,
) -> DataFrame:
    """Synthetic market series (make_financial_market_trends,
    gofast/datasets/make.py:70): price trend + returns + rolling
    indicators (20-day moving average / volatility / EMA-ish smooth /
    Bollinger bands).  Windows partition by symbol, so the generator
    scales horizontally when ``n_symbols`` grows; the reference's
    single-series shape is ``n_symbols=1``."""
    from pyspark.sql import Window

    df = (
        spark.range(samples * n_symbols)
        .withColumn("symbol", F.pmod(F.col("id"), F.lit(n_symbols)).cast("int"))
        .withColumn("t", (F.col("id") / n_symbols).cast("int"))
        .withColumn("time", F.date_add(F.lit(start_date), F.col("t")))
    )
    trend = (
        base_price
        + F.col("t") * trend_strength
        + F.sin(F.col("t") * (2.0 * 3.141592653589793 / 252.0)) * 2.0
    )
    price = trend * (1.0 + F.randn(seed) * price_noise_level)
    w = Window.partitionBy("symbol").orderBy("t")
    w20 = w.rowsBetween(-19, 0)
    df = (
        df.withColumn("price_trend", F.round(trend, 6))
        .withColumn("price", F.round(price, 6))
        .withColumn(
            "daily_return",
            F.round(F.col("price") / F.lag("price", 1).over(w) - 1.0, 6),
        )
        .withColumn("moving_average", F.round(F.avg("price").over(w20), 6))
        .withColumn(
            "price_volatility", F.round(F.stddev_samp("price").over(w20), 6)
        )
    )
    return (
        df.withColumn(
            "upper_band",
            F.round(F.col("moving_average") + 2 * F.col("price_volatility"), 6),
        )
        .withColumn(
            "lower_band",
            F.round(F.col("moving_average") - 2 * F.col("price_volatility"), 6),
        )
        .drop("id")
    )


def make_medical_diagnosis(
    spark: SparkSession,
    samples: int = 1000,
    *,
    seed: int = 42,
) -> DataFrame:
    """Synthetic patient vitals table (make_medical_diagnosis,
    gofast/datasets/make.py:2122) — the core demographic/vital/lab columns
    of the reference's 55-feature frame."""
    df = spark.range(samples).withColumnRenamed("id", "patient_id")
    age = (F.rand(seed) * 72 + 18).cast("int")
    weight = F.round(F.rand(seed + 1) * 70 + 50, 1)
    height = F.round(F.rand(seed + 2) * 50 + 145, 1)
    return (
        df.withColumn("age", age)
        .withColumn("gender", _pick(F.col("patient_id"), ["F", "M"]))
        .withColumn("weight", weight)
        .withColumn("height", height)
        .withColumn("bmi", F.round(weight / F.pow(height / 100.0, 2), 2))
        .withColumn("systolic", (F.randn(seed + 3) * 15 + 120).cast("int"))
        .withColumn("diastolic", (F.randn(seed + 4) * 10 + 80).cast("int"))
        .withColumn("heart_rate", (F.randn(seed + 5) * 12 + 72).cast("int"))
        .withColumn("temperature", F.round(F.randn(seed + 6) * 0.4 + 36.8, 1))
        .withColumn("blood_sugar", F.round(F.randn(seed + 7) * 20 + 95, 1))
        .withColumn("cholesterol", F.round(F.randn(seed + 8) * 35 + 190, 1))
        .withColumn("oxygen_saturation", F.round(98 - F.rand(seed + 9) * 6, 1))
        .withColumn(
            "smoking_status",
            _pick(F.col("patient_id") + 7, ["never", "former", "current"]),
        )
        .withColumn(
            "history_of_diabetes", (F.rand(seed + 10) < 0.12).cast("int")
        )
        .withColumn(
            "history_of_hypertension", (F.rand(seed + 11) < 0.25).cast("int")
        )
    )


def make_retail_store(
    spark: SparkSession,
    samples: int = 1000,
    *,
    seed: int = 42,
) -> DataFrame:
    """Customer-response table (make_retail_store,
    gofast/datasets/make.py:3360): demographics + shopping behavior and a
    response label."""
    df = spark.range(samples).withColumnRenamed("id", "customer_id")
    income = F.round(F.rand(seed + 1) * 90_000 + 20_000, 2)
    freq = (F.rand(seed + 2) * 30).cast("int")
    return (
        df.withColumn("age", (F.rand(seed) * 60 + 18).cast("int"))
        .withColumn("income", income)
        .withColumn("shopping_frequency", freq)
        .withColumn(
            "last_purchase_amount", F.round(F.rand(seed + 3) * 480 + 20, 2)
        )
        .withColumn(
            "preferred_category",
            _pick(
                F.col("customer_id"),
                ["electronics", "fashion", "grocery", "home", "sports"],
            ),
        )
        .withColumn(
            "likely_to_respond",
            ((income / 110_000 + freq / 30 + F.randn(seed + 4) * 0.3) > 0.8)
            .cast("int"),
        )
    )


def make_gadget_sales(
    spark: SparkSession,
    samples: int = 1500,
    *,
    start_date: str = "2024-11-20",
    seed: int = 42,
) -> DataFrame:
    """Holiday gadget sales (make_gadget_sales,
    gofast/datasets/make.py:3197): dated unit sales of gadgets by teen
    demographic."""
    df = spark.range(samples).withColumnRenamed("id", "sale_id")
    return (
        df.withColumn(
            "sale_date",
            F.date_add(F.lit(start_date), F.pmod(F.col("sale_id") * 17, F.lit(40)).cast("int")),
        )
        .withColumn(
            "gadget",
            _pick(
                F.col("sale_id"),
                ["smartphone", "tablet", "laptop", "smartwatch", "earbuds"],
            ),
        )
        .withColumn("gender", _pick(F.col("sale_id") + 3, ["F", "M"]))
        .withColumn("age", (F.rand(seed) * 7 + 12).cast("int"))
        .withColumn("units_sold", (F.rand(seed + 1) * 5 + 1).cast("int"))
        .withColumn("unit_price", F.round(F.rand(seed + 2) * 900 + 99, 2))
    )


def make_water_demand(
    spark: SparkSession,
    samples: int = 700,
    *,
    seed: int = 42,
) -> DataFrame:
    """Regional water-demand table (make_water_demand,
    gofast/datasets/make.py:3709): per-region hydrology and sectoral
    demand columns (snake_case, as the reference normalizes)."""
    df = spark.range(samples).withColumnRenamed("id", "obs_id")
    agri = F.round(F.rand(seed + 2) * 800 + 100, 2)
    indus = F.round(F.rand(seed + 3) * 400 + 50, 2)
    domestic = F.round(F.rand(seed + 4) * 300 + 80, 2)
    return (
        df.withColumn(
            "region",
            _pick(
                F.col("obs_id"),
                ["north", "south", "east", "west", "central"],
            ),
        )
        .withColumn("population", (F.rand(seed) * 990_000 + 10_000).cast("int"))
        .withColumn("rainfall_mm", F.round(F.rand(seed + 1) * 1400 + 100, 1))
        .withColumn("groundwater_level", F.round(F.rand(seed + 5) * 80 + 5, 2))
        .withColumn("agricultural_demand", agri)
        .withColumn("industrial_demand", indus)
        .withColumn("domestic_demand", domestic)
        .withColumn("total_demand", F.round(agri + indus + domestic, 2))
    )
