"""Catalog entries for the §2.9 scalar-function families (string case,
levenshtein, date features, cyclical encoding, binning, categorical
encoding, anonymization) — each oracle-matched against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import _t, query

# DuckDB has no initcap; capitalize each space-separated word explicitly
_TITLE_SQL = (
    "array_to_string(list_transform(string_split({c}, ' '), "
    "w -> upper(w[1]) || w[2:]), ' ')"
)


@query(
    "string_case_part_names",
    oracle=f"""
    SELECT p_partkey,
           {_TITLE_SQL.format(c='p_name')} AS title,
           string_split(p_name, ' ')[1] ||
             array_to_string(list_transform(string_split(p_name, ' ')[2:],
                             w -> upper(w[1]) || w[2:]), '') AS camel,
           trim(regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g'), '_') AS snake,
           trim(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'), '-') AS slug,
           upper(p_name[1]) || p_name[2:] AS cap_first
    FROM part
    """,
)
def string_case_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-converter family (gofast/utils/text.py:316-1192)."""
    from gofast_spark.functions import (
        capitalize_first,
        slugify,
        to_camel_case,
        to_snake_case,
        to_title_case,
    )

    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        to_title_case("p_name").alias("title"),
        to_camel_case("p_name").alias("camel"),
        to_snake_case("p_name").alias("snake"),
        slugify("p_name").alias("slug"),
        capitalize_first("p_name").alias("cap_first"),
    )


@query(
    "levenshtein_part_types",
    oracle="""
    SELECT DISTINCT p_type,
           CAST(levenshtein(p_type, 'ECONOMY') AS INTEGER) AS dist
    FROM part
    """,
)
def levenshtein_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (gofast/utils/text.py:1736) via the JVM built-in."""
    from gofast_spark.functions import levenshtein_distance

    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_type", levenshtein_distance("p_type", F.lit("ECONOMY")).alias("dist")
    ).distinct()


@query(
    "date_features_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_orderdate_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_orderdate_month,
           CAST(day(o_orderdate) AS INTEGER) AS o_orderdate_day,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS o_orderdate_dow,
           CAST(quarter(o_orderdate) AS INTEGER) AS o_orderdate_quarter
    FROM orders
    """,
)
def date_features_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date feature extraction (convert_date_features,
    gofast/dataops/quality.py:398).  DOW is Spark's 1=Sunday..7 convention
    (DuckDB's 0-based dayofweek is shifted in the oracle)."""
    from gofast_spark.functions import convert_date_features

    o = _t(spark, sf_dir, "orders")
    out = convert_date_features(o, "o_orderdate", day_of_week=True, quarter=True)
    return out.select(
        "o_orderkey",
        "o_orderdate_year",
        "o_orderdate_month",
        "o_orderdate_day",
        "o_orderdate_dow",
        "o_orderdate_quarter",
    )


@query(
    "cyclical_month_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(round(sin(2 * pi() * month(o_orderdate) / 12.0), 6) + 0.0 AS DOUBLE) AS m_sin,
           CAST(round(cos(2 * pi() * month(o_orderdate) / 12.0), 6) + 0.0 AS DOUBLE) AS m_cos
    FROM orders
    """,
)
def cyclical_month_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclical sin/cos encoding (DateTimeCyclicalEncoder,
    gofast/transformers/ts.py:887).

    `+ 0.0` after the round on BOTH engines: DuckDB's round keeps the sign
    bit of tiny negatives (round(sin(2*pi), 6) = -0.0) while Spark's
    BigDecimal round emits +0.0; IEEE `-0.0 + 0.0 = +0.0` canonicalizes
    both sides so the value hashes agree."""
    from gofast_spark.functions import cyclical_encode

    o = _t(spark, sf_dir, "orders").withColumn("m", F.month("o_orderdate"))
    out = cyclical_encode(o, "m", 12)
    return out.select(
        "o_orderkey",
        (F.round("m_sin", 6) + F.lit(0.0)).cast("double").alias("m_sin"),
        (F.round("m_cos", 6) + F.lit(0.0)).cast("double").alias("m_cos"),
    )


@query(
    "to_categories_acctbal",
    oracle="""
    WITH stats AS (SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer),
    b AS (
      SELECT c_custkey, c_acctbal, lo, (hi - lo) / 5 AS w,
             CAST(least(floor((c_acctbal - lo) / ((hi - lo) / 5)), 4) AS INTEGER) AS acctbal_bin
      FROM customer, stats)
    SELECT c_custkey, acctbal_bin,
           CASE acctbal_bin
             WHEN 0 THEN '< ' || printf('%.1f', lo + w)
             WHEN 4 THEN '>= ' || printf('%.1f', lo + 4 * w)
             ELSE printf('%.1f', lo + acctbal_bin * w) || '-' || printf('%.1f', lo + (acctbal_bin + 1) * w)
           END AS acctbal_cat
    FROM b
    """,
)
def to_categories_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-range binning with auto labels (to_categories,
    gofast/utils/data_utils.py:5927) — min/max fit pass, inlined
    transform."""
    from gofast_spark.functions import to_categories

    c = _t(spark, sf_dir, "customer")
    out = to_categories(
        c, "c_acctbal", k=5, method="equal_range",
        out_col="acctbal_bin", label_col="acctbal_cat",
    )
    return out.select("c_custkey", "acctbal_bin", "acctbal_cat")


@query(
    "freq_encode_mktsegment",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(*) OVER (PARTITION BY c_mktsegment) AS c_mktsegment_freq
    FROM customer
    """,
)
def freq_encode_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency encoding (CategoryFrequencyEncoder,
    gofast/transformers/feature_engineering.py:4287)."""
    from gofast_spark.functions import freq_encode

    c = _t(spark, sf_dir, "customer")
    out = freq_encode(c, "c_mktsegment")
    return out.select("c_custkey", "c_mktsegment", "c_mktsegment_freq")


@query(
    "label_encode_priority",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER)
             AS o_orderpriority_id
    FROM orders
    """,
)
def label_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label encoding with sklearn's sorted-value ids (Target.label_encode,
    gofast/dataops/preprocessing.py:128).  The global sort touches only the
    distinct values (tiny), broadcast back onto the fact table."""
    from gofast_spark.functions import label_encode

    o = _t(spark, sf_dir, "orders")
    out = label_encode(o, "o_orderpriority")
    return out.select("o_orderkey", "o_orderpriority", "o_orderpriority_id")


@query(
    "one_hot_orderstatus",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderstatus = 'F' AS INTEGER) AS o_orderstatus_F,
           CAST(o_orderstatus = 'O' AS INTEGER) AS o_orderstatus_O,
           CAST(o_orderstatus = 'P' AS INTEGER) AS o_orderstatus_P
    FROM orders
    """,
)
def one_hot_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot indicators with a pinned category set (Target.one_hot_encode,
    gofast/dataops/preprocessing.py:169)."""
    from gofast_spark.functions import one_hot_encode

    o = _t(spark, sf_dir, "orders")
    out = one_hot_encode(o, "o_orderstatus", values=["F", "O", "P"])
    return out.select(
        "o_orderkey", "o_orderstatus_F", "o_orderstatus_O", "o_orderstatus_P"
    )


@query(
    "data_facade_pipeline",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER)
             AS o_orderpriority_id,
           o_totalprice AS price
    FROM orders WHERE o_totalprice > 400000
    """,
)
def data_facade_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deferred-op chain through the Data facade (SURVEY §3.2; reference
    Data queue, gofast/dataops/core.py:31-171): filter -> encode ->
    rename, composed into one Catalyst plan."""
    from gofast_spark import Data

    o = _t(spark, sf_dir, "orders")
    out = (
        Data(o)
        .filter(F.col("o_totalprice") > 400000)
        .encode("o_orderpriority")
        .rename({"o_totalprice": "price"})
        .execute()
    )
    return out.select("o_orderkey", "o_orderpriority", "o_orderpriority_id", "price")


@query(
    "map_values_binarize_orders",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                ELSE 'other' END AS status_label,
           CAST(o_totalprice > 250000 AS INTEGER) AS big_order
    FROM orders
    """,
)
def map_values_binarize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary remap + threshold binarize (map_values,
    gofast/utils/base_utils.py:78; Target.binarize,
    gofast/dataops/preprocessing.py:265)."""
    from gofast_spark.functions.encoding import binarize, map_values

    o = _t(spark, sf_dir, "orders")
    out = map_values(
        o, "o_orderstatus", {"F": "finished", "O": "open"},
        default="other", out_col="status_label",
    )
    out = binarize(out, "o_totalprice", 250000, out_col="big_order")
    return out.select("o_orderkey", "status_label", "big_order")


@query(
    "categorical_cast_nation",
    oracle="""
    SELECT n_nationkey, CAST(n_regionkey AS VARCHAR) AS n_regionkey
    FROM nation
    """,
)
def categorical_cast_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-cardinality numeric -> categorical cast
    (handle_categorical_features, gofast/dataops/quality.py:325):
    n_regionkey (5 distinct) flips to string, n_nationkey (25 distinct,
    above the threshold) stays numeric."""
    from gofast_spark.functions.encoding import handle_categorical_features

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    out = handle_categorical_features(n, max_unique=10)
    assert dict(out.dtypes)["n_regionkey"] == "string"
    assert dict(out.dtypes)["n_nationkey"] == "int"  # 25 distinct: unchanged
    return out


@query(
    "anonymize_customer_names",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '\\d{4,}', '[NUM]', 'g') AS masked_name
    FROM customer
    """,
)
def anonymize_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (anonymize_text, gofast/utils/text.py:1929)."""
    from gofast_spark.functions import anonymize_text

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", anonymize_text("c_name").alias("masked_name")
    )
