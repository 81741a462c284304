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
        spark, n_samples, n_features, noise=noise, seed=seed
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


def _gen(spark: SparkSession, n: int, id_name: str, spec: dict, seed: int) -> DataFrame:
    """Spec-driven distributed generator: each spec entry is
    ('uniform', lo, hi, round) | ('normal', mu, sd, round) |
    ('int', lo, hi) | ('choice', [..]) | ('expr', column_fn) — evaluated
    as seeded column expressions over spark.range (never on the driver)."""
    df = spark.range(n).withColumnRenamed("id", id_name)
    i = 0
    for name, s in spec.items():
        kind = s[0]
        if kind == "uniform":
            col = F.round(F.rand(seed + i) * (s[2] - s[1]) + s[1], s[3])
        elif kind == "normal":
            col = F.round(F.randn(seed + i) * s[2] + s[1], s[3])
        elif kind == "int":
            col = (F.rand(seed + i) * (s[2] - s[1]) + s[1]).cast("int")
        elif kind == "choice":
            col = _pick(F.col(id_name) + i, s[1])
        elif kind == "expr":
            col = s[1](F.col(id_name))
        else:  # pragma: no cover
            raise ValueError(f"unknown spec kind {kind!r}")
        df = df.withColumn(name, col)
        i += 1
    return df


def make_social_media_comments(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Comment stream (make_social_media_comments,
    gofast/datasets/make.py:1205): username/comment/timestamp/likes."""
    words = ["great", "nice", "wow", "bad", "love", "meh", "cool", "why"]
    return _gen(
        spark, samples, "comment_id",
        {
            "username": (
                "expr",
                lambda c: F.concat(F.lit("user_"), F.pmod(c * 37, F.lit(120))),
            ),
            "comment": ("choice", [f"{a} {b}" for a in words for b in ("post", "pic")]),
            "timestamp": (
                "expr",
                lambda c: F.to_timestamp(
                    F.date_add(F.lit("2024-01-01"), F.pmod(c, F.lit(120)).cast("int"))
                ),
            ),
            "likes": ("int", 0, 500),
        },
        seed,
    )


def make_african_demo(
    spark: SparkSession, *, n_countries: int = 5, n_years: int = 10, seed: int = 42
) -> DataFrame:
    """Demographics panel (make_african_demo,
    gofast/datasets/make.py:1346): country x year population/vital-rate
    table."""
    countries = ["Nigeria", "Ethiopia", "Egypt", "DR Congo", "Tanzania",
                 "South Africa", "Kenya", "Uganda", "Algeria", "Sudan"][:n_countries]
    n = len(countries) * n_years
    df = spark.range(n)
    ci = F.pmod(F.col("id"), F.lit(len(countries)))
    country = F.lit(countries[0])
    for i, c in enumerate(countries[1:], start=1):
        country = F.when(ci == i, F.lit(c)).otherwise(country)
    return (
        df.withColumn("country", country)
        .withColumn("year", (2010 + (F.col("id") / len(countries)).cast("int")))
        .withColumn("population", (F.rand(seed) * 1.9e8 + 1e7).cast("long"))
        .withColumn("birth_rate", F.round(F.rand(seed + 1) * 30 + 15, 2))
        .withColumn("death_rate", F.round(F.rand(seed + 2) * 10 + 5, 2))
        .withColumn("urbanization_rate", F.round(F.rand(seed + 3) * 60 + 20, 2))
        .withColumn("gdp_per_capita", F.round(F.rand(seed + 4) * 9500 + 500, 2))
        .drop("id")
    )


def make_agronomy_feedback(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Farm-year agronomy panel (make_agronomy_feedback,
    gofast/datasets/make.py:1529)."""
    return _gen(
        spark, samples, "row_id",
        {
            "farm_id": ("expr", lambda c: F.pmod(c * 13, F.lit(100))),
            "year": ("int", 2015, 2025),
            "crop": ("choice", ["maize", "wheat", "rice", "soy", "cassava"]),
            "soil_ph": ("uniform", 4.5, 8.5, 2),
            "temperature": ("uniform", 12.0, 35.0, 1),
            "rainfall": ("uniform", 200.0, 1800.0, 1),
            "pesticide_type": ("choice", ["none", "organic", "synthetic"]),
            "pesticide_amount": ("uniform", 0.0, 12.0, 2),
            "crop_yield": ("uniform", 800.0, 9000.0, 1),
        },
        seed,
    )


def make_mining_ops(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Mining operations table (make_mining_ops,
    gofast/datasets/make.py:1720)."""
    return _gen(
        spark, samples, "op_id",
        {
            "easting": ("uniform", 300000.0, 900000.0, 2),
            "northing": ("uniform", 4000000.0, 9000000.0, 2),
            "depth": ("uniform", 5.0, 1200.0, 2),
            "ore_type": ("choice", ["gold", "copper", "iron", "bauxite"]),
            "ore_concentration": ("uniform", 0.5, 15.0, 3),
            "drill_diameter": ("uniform", 75.0, 350.0, 1),
            "blast_hole_depth": ("uniform", 3.0, 25.0, 2),
            "explosive_type": ("choice", ["ANFO", "emulsion", "dynamite"]),
            "explosive_amount": ("uniform", 50.0, 2000.0, 1),
            "equipment_type": ("choice", ["excavator", "loader", "hauler", "drill_rig"]),
            "equipment_age": ("int", 0, 20),
            "daily_production": ("uniform", 1000.0, 50000.0, 1),
        },
        seed,
    )


def make_sounding(
    spark: SparkSession, samples: int = 800, *, n_layers: int = 5, seed: int = 42
) -> DataFrame:
    """Vertical electrical sounding layers (make_sounding,
    gofast/datasets/make.py:1951)."""
    return _gen(
        spark, samples, "row_id",
        {
            "survey_point_id": ("expr", lambda c: (c / n_layers).cast("int")),
            "layer_depth": (
                "expr",
                lambda c: F.round((F.pmod(c, F.lit(n_layers)) + 1) * (F.rand(seed + 90) * 10 + 5), 2),
            ),
            "resistivity": ("uniform", 10.0, 1500.0, 2),
            "seismic_velocity": ("uniform", 300.0, 6000.0, 1),
        },
        seed,
    )


def make_well_logging(
    spark: SparkSession, samples: int = 1000, *, depth_step: float = 0.5, seed: int = 42
) -> DataFrame:
    """Borehole log curve set (make_well_logging,
    gofast/datasets/make.py:2371)."""
    return _gen(
        spark, samples, "sample_id",
        {
            "depth": ("expr", lambda c: F.round(c * depth_step, 2)),
            "gamma_ray": ("uniform", 20.0, 250.0, 2),
            "resistivity": ("uniform", 0.2, 2000.0, 3),
            "neutron_porosity": ("uniform", 0.05, 0.45, 4),
            "density": ("uniform", 1.95, 2.95, 3),
        },
        seed,
    )


def make_ert(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Electrical-resistivity-tomography acquisition table (make_ert,
    gofast/datasets/make.py:2525)."""
    return _gen(
        spark, samples, "measure_id",
        {
            "electrode_position": ("expr", lambda c: F.round(c * 5.0, 1)),
            "cable_length": ("choice", ["100m", "200m", "400m"]),
            "resistivity": ("uniform", 5.0, 2500.0, 2),
            "battery_voltage": ("uniform", 11.0, 13.0, 2),
            "equipment_type": ("choice", ["SAS4000", "SyscalPro", "ABEM"]),
        },
        seed,
    )


def make_tem(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Transient-EM soundings (make_tem, gofast/datasets/make.py:2686)."""
    return _gen(
        spark, samples, "sounding_id",
        {
            "latitude": ("uniform", -35.0, 37.0, 6),
            "longitude": ("uniform", -17.0, 51.0, 6),
            "time": ("expr", lambda c: F.round(F.pow(10.0, F.rand(seed + 77) * 4 - 6), 8)),
            "tem_measurement": ("uniform", 0.001, 800.0, 4),
            "equipment_type": ("choice", ["WalkTEM", "terraTEM", "FastSnap"]),
        },
        seed,
    )


def make_erp(
    spark: SparkSession, samples: int = 1000, *, step: float = 10.0, seed: int = 42
) -> DataFrame:
    """Electrical-resistivity profiling line (make_erp,
    gofast/datasets/make.py:2858)."""
    return _gen(
        spark, samples, "station_id",
        {
            "easting": ("uniform", 300000.0, 900000.0, 2),
            "northing": ("uniform", 4000000.0, 9000000.0, 2),
            "longitude": ("uniform", -17.0, 51.0, 6),
            "latitude": ("uniform", -35.0, 37.0, 6),
            "position": ("expr", lambda c: F.round(c * step, 1)),
            "step": ("expr", lambda c: F.lit(step)),
            "resistivity": ("uniform", 5.0, 2500.0, 2),
        },
        seed,
    )


def make_elogging(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Equipment log stream (make_elogging, gofast/datasets/make.py:3038)."""
    return _gen(
        spark, samples, "log_id",
        {
            "timestamp": (
                "expr",
                lambda c: F.timestamp_seconds(
                    F.unix_timestamp(F.lit("2024-01-01 00:00:00")) + c * 37
                ),
            ),
            "log_level": ("choice", ["INFO", "WARNING", "ERROR", "DEBUG"]),
            "message": ("choice", [
                "pump started", "pressure drop detected", "valve closed",
                "sensor calibrated", "temperature threshold exceeded",
            ]),
        },
        seed,
    )


def make_cc_factors(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Climate-change factor matrix (make_cc_factors,
    gofast/datasets/make.py:3525): the reference's scaled factor columns
    (a representative half of the 22)."""
    cols = [
        "ghg", "def_land", "fossil_fuels", "indust_proc", "agri_livestock",
        "transport", "energy_prod", "urban_infra", "waste_mgmt",
        "aerosols", "ocean_acid",
    ]
    spec = {c: ("uniform", 0.0, 1.0, 4) for c in cols}
    return _gen(spark, samples, "obs_id", spec, seed)


def make_system_dynamics(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Control-system response table (make_system_dynamics,
    gofast/datasets/make.py:315): input signal and first-order response
    columns."""
    df = spark.range(samples).withColumnRenamed("id", "t")
    inp = F.sin(F.col("t") * 0.05) + F.randn(seed) * 0.05
    lin = inp * 0.8 + 0.1
    return (
        df.withColumn("time", F.round(F.col("t") * 0.1, 2))
        .withColumn("input_signal", F.round(inp, 4))
        .withColumn("linear_output", F.round(lin, 4))
        .withColumn("response_output", F.round(lin + F.randn(seed + 1) * 0.02, 4))
        .withColumn("error_signal", F.round(inp - lin, 4))
        .withColumn("power_consumption", F.round(F.abs(lin) * 10 + F.rand(seed + 2), 3))
        .withColumn(
            "stability_metric", F.round(1.0 / (1.0 + F.abs(inp - lin)), 4)
        )
    )


def make_drill_ops(
    spark: SparkSession, samples: int = 1000, *, seed: int = 42
) -> DataFrame:
    """Hydro-drilling targets (make_drill_ops,
    gofast/datasets/make.py:3886)."""
    return _gen(
        spark, samples, "site_id",
        {
            "region": ("choice", ["north", "south", "east", "west"]),
            "deep_mine_targets": ("int", 0, 12),
            "regular_targets": ("int", 0, 30),
            "water_quality_parameters": ("uniform", 0.0, 14.0, 2),
            "fracture_density_and_orientation": ("uniform", 0.0, 1.0, 4),
            "recommended": ("expr", lambda c: (F.rand(seed + 50) > 0.5).cast("int")),
        },
        seed,
    )


# ---------------------------------------------------------------------------
# Named ``load_*`` datasets (gofast/datasets/load.py:38-1791).  The
# reference ships packaged survey CSVs; shipping that data is out of
# scope here (and copying it would defeat the no-copy contract), so each
# loader is a schema-faithful seeded generator: same name -> same data,
# same column names/dtypes as the reference's frame, any requested size.
# ---------------------------------------------------------------------------


def load_iris(spark: SparkSession, samples: int = 150, *, seed: int = 42) -> DataFrame:
    """Iris-shaped frame (load_iris, gofast/datasets/load.py:1143):
    4 measurements + integer target 0/1/2."""
    return _gen(
        spark, samples, "sample_id",
        {
            "sepal_length": ("uniform", 4.3, 7.9, 2),
            "sepal_width": ("uniform", 2.0, 4.4, 2),
            "petal_length": ("uniform", 1.0, 6.9, 2),
            "petal_width": ("uniform", 0.1, 2.5, 2),
            "target": ("expr", lambda c: F.pmod(c, F.lit(3)).cast("int")),
        },
        seed,
    )


def load_statlog(spark: SparkSession, samples: int = 270, *, seed: int = 42) -> DataFrame:
    """Statlog heart-disease schema (load_statlog,
    gofast/datasets/load.py:341)."""
    return _gen(
        spark, samples, "patient_id",
        {
            "age": ("int", 29, 78),
            "sex": ("int", 0, 2),
            "chest_pain": ("int", 1, 5),
            "trestbps": ("int", 94, 201),
            "chol": ("int", 126, 565),
            "fbs": ("int", 0, 2),
            "restecg": ("int", 0, 3),
            "thalach": ("int", 71, 203),
            "exang": ("int", 0, 2),
            "oldpeak": ("uniform", 0.0, 6.2, 1),
            "slope": ("int", 1, 4),
            "ca": ("int", 0, 4),
            "thal": ("choice", [3, 6, 7]),
            "presence": ("int", 0, 2),
        },
        seed,
    )


def load_dyspnea(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Dyspnea triage schema (load_dyspnea, gofast/datasets/load.py:448)."""
    return _gen(
        spark, samples, "record_id",
        {
            "age": ("int", 18, 95),
            "respiratory_rate": ("int", 10, 45),
            "spo2": ("int", 70, 100),
            "heart_rate": ("int", 45, 160),
            "systolic_bp": ("int", 80, 200),
            "diagnosis": ("choice", ["asthma", "copd", "pneumonia", "cardiac", "other"]),
            "respiratory_distress": ("int", 0, 2),
            "dyspnea": ("choice", ["mild", "moderate", "severe"]),
        },
        seed,
    )


def load_hydro_metrics(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Daily hydrology metrics (load_hydro_metrics,
    gofast/datasets/load.py:209)."""
    return _gen(
        spark, samples, "obs_id",
        {
            "date": (
                "expr",
                lambda c: F.date_add(F.lit("2015-01-01"), F.pmod(c, F.lit(3650)).cast("int")),
            ),
            "rainfall": ("uniform", 0.0, 120.0, 1),
            "temperature": ("uniform", 5.0, 40.0, 1),
            "evapotranspiration": ("uniform", 0.0, 12.0, 2),
            "humidity": ("uniform", 20.0, 100.0, 1),
            "flow": ("uniform", 0.0, 500.0, 2),
        },
        seed,
    )


def load_toc(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Total-organic-carbon well logs (load_toc,
    gofast/datasets/load.py:38)."""
    return _gen(
        spark, samples, "depth_id",
        {
            "cal": ("uniform", 6.0, 16.0, 3),
            "cnl": ("uniform", 5.0, 45.0, 3),
            "den": ("uniform", 1.9, 2.9, 3),
            "gr": ("uniform", 20.0, 220.0, 2),
            "rt10": ("uniform", 0.5, 200.0, 3),
            "rt20": ("uniform", 0.5, 200.0, 3),
            "rt30": ("uniform", 0.5, 200.0, 3),
            "rt60": ("uniform", 0.5, 200.0, 3),
            "rt90": ("uniform", 0.5, 200.0, 3),
            "toc": ("uniform", 0.0, 12.0, 3),
        },
        seed,
    )


def load_bagoue(spark: SparkSession, samples: int = 431, *, seed: int = 42) -> DataFrame:
    """Bagoue groundwater-flow survey schema (load_bagoue,
    gofast/datasets/load.py:1014)."""
    return _gen(
        spark, samples, "site_id",
        {
            "power": ("uniform", 10.0, 150.0, 2),
            "magnitude": ("uniform", 0.5, 6.0, 2),
            "sfi": ("uniform", 0.0, 2.0, 3),
            "ohmS": ("uniform", 100.0, 3000.0, 1),
            "lwi": ("uniform", 0.0, 50.0, 2),
            "geol": ("choice", ["granites", "volcano-sedimentary", "schists", "gneiss"]),
            "shape": ("choice", ["V", "W", "U", "H", "M", "C", "K"]),
            "type": ("choice", ["CP", "NC", "CB2P"]),
            "flow": ("int", 0, 4),
        },
        seed,
    )


def load_hlogs(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Borehole hydro-log schema (load_hlogs, gofast/datasets/load.py:604)."""
    return _gen(
        spark, samples, "depth_id",
        {
            "depth_top": ("expr", lambda c: F.round(c * 1.5, 1)),
            "depth_bottom": ("expr", lambda c: F.round(c * 1.5 + 1.5, 1)),
            "strata_name": ("choice", ["siltstone", "mudstone", "sandstone", "coal", "gravel"]),
            "rock_name": ("choice", ["fine", "medium", "coarse"]),
            "gamma_gamma": ("uniform", 800.0, 3000.0, 1),
            "natural_gamma": ("uniform", 5.0, 150.0, 1),
            "resistivity": ("uniform", 5.0, 500.0, 2),
            "sp": ("uniform", -120.0, 120.0, 2),
            "short_distance_gamma": ("uniform", 500.0, 2500.0, 1),
            "well_diameter": ("uniform", 90.0, 250.0, 1),
            "aquifer_group": ("choice", ["I", "II", "III"]),
            "k": ("uniform", 0.0, 12.0, 4),
        },
        seed,
    )


def load_nansha(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Nansha land-subsidence / engineering schema (load_nansha,
    gofast/datasets/load.py:796)."""
    return _gen(
        spark, samples, "borehole_id",
        {
            "easting": ("uniform", 2522000.0, 2544000.0, 1),
            "northing": ("uniform", 19740000.0, 19780000.0, 1),
            "ground_height_distance": ("uniform", 0.0, 12.0, 2),
            "static_water_level": ("uniform", 0.2, 8.0, 2),
            "drawdown": ("uniform", 0.5, 30.0, 2),
            "filter_pipe_diameter": ("uniform", 0.1, 0.6, 3),
            "water_inflow": ("uniform", 0.5, 40.0, 2),
            "land_subsidence": ("uniform", 0.0, 80.0, 2),
            "geology": ("choice", ["silt", "silty clay", "fine sand", "medium sand", "mucky soil"]),
        },
        seed,
    )


def load_mxs(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Mixture-study aquifer schema (load_mxs, gofast/datasets/load.py:1253)."""
    return _gen(
        spark, samples, "sample_id",
        {
            "strata": ("choice", ["I", "II", "III", "IV"]),
            "resistivity": ("uniform", 5.0, 800.0, 2),
            "gamma": ("uniform", 10.0, 200.0, 2),
            "sp": ("uniform", -100.0, 100.0, 2),
            "k": ("uniform", 0.0, 10.0, 4),
            "kp": ("int", 1, 4),
        },
        seed,
    )


def load_forensic(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Forensic-DNA survey schema (load_forensic,
    gofast/datasets/load.py:1629)."""
    return _gen(
        spark, samples, "respondent_id",
        {
            "date": (
                "expr",
                lambda c: F.date_add(F.lit("2022-01-01"), F.pmod(c, F.lit(365)).cast("int")),
            ),
            "gender": ("choice", ["male", "female"]),
            "age_group": ("choice", ["18-24", "25-34", "35-44", "45-54", "55+"]),
            "education": ("choice", ["primary", "secondary", "tertiary"]),
            "dna_knowledge": ("int", 0, 6),
            "dna_use_terrorism_fight": ("choice", ["yes", "no", "maybe"]),
            "support_national_db": ("choice", ["yes", "no", "undecided"]),
        },
        seed,
    )


def load_jrs_bet(spark: SparkSession, samples: int = 1000, *, seed: int = 42) -> DataFrame:
    """Lottery-draw history schema (load_jrs_bet,
    gofast/datasets/load.py:1791)."""
    return _gen(
        spark, samples, "draw_id",
        {
            "date": (
                "expr",
                lambda c: F.date_add(F.lit("2010-01-03"), (c * 3).cast("int")),
            ),
            "location": ("choice", ["abidjan", "bouake", "daloa", "korhogo"]),
            "winning_numbers": (
                "expr",
                lambda c: F.concat_ws(
                    "-",
                    F.pmod(c * 7 + 3, F.lit(90)) + 1,
                    F.pmod(c * 13 + 11, F.lit(90)) + 1,
                    F.pmod(c * 29 + 17, F.lit(90)) + 1,
                    F.pmod(c * 31 + 23, F.lit(90)) + 1,
                    F.pmod(c * 37 + 41, F.lit(90)) + 1,
                ),
            ),
            "target": ("int", 0, 2),
        },
        seed,
    )


def fetch_data(spark: SparkSession, tag: str, **kwargs) -> DataFrame:
    """Tag-dispatch dataset fetcher (fetch_data,
    gofast/datasets/_data_loader.py:63) — the 12th member of the load
    family: a free-form tag ('bagoue', 'iris prepared', 'load_mxs'...)
    resolves to its registry generator; extra words in the tag (the
    reference's processing-stage suffixes) are ignored, unknown tags
    raise KeyError listing what exists."""
    from gofast_spark.sources.io import dataset_registry

    registry = dataset_registry()
    norm = tag.strip().lower()
    for p in ("load_", "make_"):
        if norm.startswith(p):
            norm = norm[len(p):]
    words = norm.replace("-", " ").replace("_", " ").split()
    # longest joined prefix wins: 'cc factors preprocessed' tries
    # cc_factors_preprocessed, cc_factors, cc — so multi-word dataset
    # names resolve even with stage suffixes appended, and 'market
    # sales' deterministically prefers the longest known name
    for i in range(len(words), 0, -1):
        cand = "_".join(words[:i])
        if cand in registry:
            return registry[cand](spark, **kwargs)
    # legacy fallback: a known name anywhere in the tag
    # ('preprocessed bagoue')
    for word in words:
        if word in registry:
            return registry[word](spark, **kwargs)
    raise KeyError(
        f"unknown dataset tag {tag!r}; available: {sorted(registry)}"
    )
