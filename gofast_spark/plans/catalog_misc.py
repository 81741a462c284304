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


# DuckDB replica of text.analysis.normalize_text (exact recipe)
_NORM_TXT = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


@query(
    "quartiles_iqr_quantity",
    oracle="""
    SELECT CAST(round(quantile_cont(l_quantity, 0.25), 4) AS DOUBLE) AS q1,
           CAST(round(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS q2,
           CAST(round(quantile_cont(l_quantity, 0.75), 4) AS DOUBLE) AS q3,
           CAST(round(quantile_cont(l_quantity, 0.75)
                      - quantile_cont(l_quantity, 0.25), 4) AS DOUBLE) AS iqr
    FROM lineitem
    """,
)
def quartiles_iqr_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles + IQR (quartiles/iqr,
    gofast/stats/descriptive.py:1100, 1244) — continuous percentiles,
    type-7 interpolation on both engines."""
    from gofast_spark.stats.descriptive import iqr, quartiles

    li = _t(spark, sf_dir, "lineitem")
    q = quartiles(li, "l_quantity")
    i = iqr(li, "l_quantity")
    return q.crossJoin(i).select(
        F.round("q1", 4).cast("double").alias("q1"),
        F.round("q2", 4).cast("double").alias("q2"),
        F.round("q3", 4).cast("double").alias("q3"),
        F.round("iqr", 4).cast("double").alias("iqr"),
    )


@query(
    "descriptive_extras_quantity",
    oracle="""
    WITH h AS (
      SELECT count(l_quantity) / sum(1.0 / l_quantity) AS hmean,
             max(l_quantity) - min(l_quantity) AS range FROM lineitem),
    m AS (
      SELECT l_quantity AS mode FROM lineitem
      GROUP BY l_quantity ORDER BY count(*) DESC, l_quantity ASC LIMIT 1)
    SELECT CAST(round(h.hmean, 4) AS DOUBLE) AS hmean,
           CAST(round(h.range, 4) AS DOUBLE) AS range,
           CAST(round(m.mode, 4) AS DOUBLE) AS mode
    FROM h, m
    """,
)
def descriptive_extras_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic mean, range, deterministic mode (hmean/get_range/mode,
    gofast/stats/descriptive.py:1916, 1714, 664) in one row."""
    from gofast_spark.stats.descriptive import get_range, hmean, mode_of

    li = _t(spark, sf_dir, "lineitem")
    return (
        hmean(li, "l_quantity")
        .crossJoin(get_range(li, "l_quantity"))
        .crossJoin(mode_of(li, "l_quantity"))
        .select(
            F.round("hmean", 4).cast("double").alias("hmean"),
            F.round("range", 4).cast("double").alias("range"),
            F.round("mode", 4).cast("double").alias("mode"),
        )
    )


@query(
    "standard_scale_acctbal",
    oracle="""
    WITH s AS (
      SELECT avg(c_acctbal) AS mu, stddev_samp(c_acctbal) AS sd FROM customer)
    SELECT c_custkey,
           CAST(round((c_acctbal - mu) / sd, 4) + 0.0 AS DOUBLE) AS z
    FROM customer, s
    """,
)
def standard_scale_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-std standardization (standard_scale,
    quality/scaling.py; reference scaler matrix
    gofast/dataops/quality.py:2790).  Both sides add +0.0 after the
    rounding: a value rounding to exactly zero from below yields -0.0,
    whose repr differs from 0.0 under the driver's full-precision
    normalization — IEEE x + 0.0 collapses the signed zero on either
    engine (caught by the r14 sf0.1 differential sweep)."""
    from gofast_spark.quality.scaling import standard_scale

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = standard_scale(c, ["c_acctbal"], ddof=1, suffix="_z")
    return out.select(
        "c_custkey",
        (F.round("c_acctbal_z", 4) + F.lit(0.0))
        .cast("double")
        .alias("z"),
    )


@query(
    "nan_ops_fill_customer",
    oracle="""
    SELECT c_custkey,
           CAST(round(CASE WHEN c_acctbal < 0 THEN 0 ELSE c_acctbal END, 2)
                AS DOUBLE) AS bal
    FROM customer
    """,
)
def nan_ops_fill_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nan_ops fill mode (gofast/utils/data_utils.py:1621): negative
    balances nulled then constant-filled with 0."""
    from gofast_spark.quality.missing import nan_ops

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    out = nan_ops(c, "fill", columns=["bal"], fill_value=0)
    return out.select(
        "c_custkey", F.round("bal", 2).cast("double").alias("bal")
    )


@query(
    "truncate_tokens_part",
    oracle=f"""
    WITH t AS (SELECT p_partkey, p_name, {_NORM_TXT.format(c='p_name')} AS nm
               FROM part)
    SELECT p_partkey,
           CASE WHEN length(p_name) > 12
                THEN substr(p_name, 1, 12) || '...' ELSE p_name END AS head,
           CAST(CASE WHEN nm = '' THEN 0
                ELSE length(nm) - length(replace(nm, ' ', '')) + 1 END
                AS INTEGER) AS n_tokens
    FROM t
    """,
)
def truncate_tokens_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """truncate_text + whitespace tokenize (gofast/utils/text.py:1368,
    740) over part names."""
    from gofast_spark.functions.strings import truncate_text
    from gofast_spark.text.analysis import tokenize_text

    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        truncate_text(F.col("p_name"), 12).alias("head"),
        F.size(tokenize_text(F.col("p_name"))).cast("int").alias("n_tokens"),
    )


@query(
    "stationarity_diff_log_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS d, round(sum(value), 4) AS v
      FROM events GROUP BY 1)
    SELECT d,
           CAST(round(v - lag(v) OVER (ORDER BY d), 4) AS DOUBLE) AS diff,
           CAST(round(ln(v), 6) AS DOUBLE) AS logv
    FROM d
    """,
)
def stationarity_diff_log_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationarity transforms — differencing and log
    (transform_stationarity, gofast/utils/ts_utils.py:3262) over daily
    revenue."""
    from gofast_spark.ts.engineering import transform_stationarity

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.round(F.sum("value"), 4).cast("double").alias("v")
    )
    out = transform_stationarity(
        daily, "v", "d", method="diff", out_col="diff"
    )
    out = transform_stationarity(out, "v", "d", method="log", out_col="logv")
    return out.select(
        "d",
        F.round("diff", 4).cast("double").alias("diff"),
        F.round("logv", 6).cast("double").alias("logv"),
    )


@query(
    "resample_consistent_counts",
    oracle="""
    WITH surv_c AS (
      SELECT c_custkey FROM customer
      WHERE ((c_custkey + 0) * 1103515245 + 12345) % 2147483648 % 100 < 50),
    surv_o AS (
      SELECT o_orderkey FROM orders
      WHERE ((o_custkey + 0) * 1103515245 + 12345) % 2147483648 % 100 < 50)
    SELECT 'customer' AS frame, CAST(count(*) AS BIGINT) AS n FROM surv_c
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT) FROM surv_o
    """,
)
def resample_consistent_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent multi-frame sampling (resample_data,
    gofast/utils/data_utils.py:3187): the same hashed keys survive in
    every frame, keeping downstream joins aligned."""
    from gofast_spark.operators.sampling import resample_data

    c = _t(spark, sf_dir, "customer").withColumn("k", F.col("c_custkey"))
    o = _t(spark, sf_dir, "orders").withColumn("k", F.col("o_custkey"))
    sc_, so_ = resample_data([c, o], "k", fraction=0.5, seed=0)
    a = sc_.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("customer").alias("frame"), "n"
    )
    b = so_.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("orders").alias("frame"), "n"
    )
    return a.unionByName(b)


@query(
    "audit_data_customer",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(c_acctbal, 0.25) AS q1,
             quantile_cont(c_acctbal, 0.75) AS q3
      FROM customer),
    clipped AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < q1 - 1.5 * (q3 - q1) THEN q1 - 1.5 * (q3 - q1)
                  WHEN c_acctbal > q3 + 1.5 * (q3 - q1) THEN q3 + 1.5 * (q3 - q1)
                  ELSE c_acctbal END AS v
      FROM customer, q),
    mm AS (SELECT min(v) AS mn, max(v) AS mx FROM clipped)
    SELECT c_custkey,
           CAST(round((v - mn) / (mx - mn), 6) AS DOUBLE) AS scaled
    FROM clipped, mm
    """,
)
def audit_data_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite audit pipeline — IQR clip, mean-fill (no-op on complete
    data), minmax scale (audit_data, gofast/dataops/quality.py:98)."""
    from gofast_spark.quality.audit import audit_data

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("v")
    )
    out = audit_data(c, columns=["v"])
    return out.select(
        "c_custkey", F.round("v", 6).cast("double").alias("scaled")
    )


@query(
    "has_duplicates_orders",
    oracle="""
    SELECT CAST(EXISTS (
             SELECT 1 FROM orders
             GROUP BY o_custkey, o_orderstatus HAVING count(*) > 1
           ) AS BOOLEAN) AS dup_custstatus,
           CAST(EXISTS (
             SELECT 1 FROM orders
             GROUP BY o_orderkey HAVING count(*) > 1
           ) AS BOOLEAN) AS dup_orderkey
    """,
)
def has_duplicates_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-exit duplicate probe (has_duplicates,
    gofast/utils/data_utils.py:2425): true for a repeating key subset,
    false for the primary key."""
    from gofast_spark.quality.duplicates import has_duplicates

    o = _t(spark, sf_dir, "orders")
    a = has_duplicates(o, subset=["o_custkey", "o_orderstatus"])
    b = has_duplicates(o, subset=["o_orderkey"])
    return spark.createDataFrame(
        [(a, b)], "dup_custstatus boolean, dup_orderkey boolean"
    )


@query(
    "cleaner_customer",
    oracle="""
    SELECT c_custkey AS cust_key, c_mktsegment AS segment FROM customer
    """,
)
def cleaner_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column keep + name sanitation in one call (cleaner,
    gofast/utils/data_utils.py:4293)."""
    from gofast_spark.quality.augment import cleaner

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("Cust Key"),
        F.col("c_mktsegment").alias("Segment!"),
        "c_acctbal",
    )
    return cleaner(c, columns=["Cust Key", "Segment!"], mode="keep")


@query(
    "outlier_handler_zscore_transfer",
    oracle="""
    WITH train AS (SELECT c_acctbal FROM customer WHERE c_nationkey < 13),
    s AS (SELECT avg(c_acctbal) AS mu, stddev_samp(c_acctbal) AS sd FROM train)
    SELECT c_custkey,
           CAST(round(
             CASE WHEN c_acctbal < mu - 1.5 * sd THEN mu - 1.5 * sd
                  WHEN c_acctbal > mu + 1.5 * sd THEN mu + 1.5 * sd
                  ELSE c_acctbal END, 4) AS DOUBLE) AS clipped
    FROM customer, s
    """,
)
def outlier_handler_zscore_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-pattern outlier handling (OutlierHandler,
    gofast/transformers/feature_engineering.py:78): z-score bounds FIT on
    the nationkey<13 subset, TRANSFORM applied to the full table — the
    train/test semantics the one-shot functional form cannot express."""
    from gofast_spark.quality.outliers import OutlierHandler

    c = _t(spark, sf_dir, "customer")
    h = OutlierHandler(
        ["c_acctbal"], method="zscore", action="clip", factor=1.5
    ).fit(c.where(F.col("c_nationkey") < 13))
    out = h.transform(c)
    return out.select(
        "c_custkey",
        F.round("c_acctbal", 4).cast("double").alias("clipped"),
    )


@query(
    "range_join_acctbal_brackets",
    oracle="""
    WITH iv AS (
      SELECT n_nationkey AS bracket_id,
             -1000.0 + n_nationkey * 440.0 AS lo,
             -300.0 + n_nationkey * 440.0 AS hi
      FROM nation)
    SELECT iv.bracket_id,
           count(*) AS n_customers,
           CAST(round(sum(c.c_acctbal), 2) AS DOUBLE) AS acctbal_sum
    FROM customer c JOIN iv
      ON c.c_acctbal >= iv.lo AND c.c_acctbal <= iv.hi
    GROUP BY iv.bracket_id
    """,
)
def range_join_acctbal_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (operators/range_join.py): customers matched
    into overlapping acctbal brackets derived from the nation table,
    aggregated per bracket.  The oracle runs the plain inequality join —
    the bucketed equi-join plan must find exactly the same containments."""
    from gofast_spark.operators import range_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n = _t(spark, sf_dir, "nation")
    iv = n.select(
        F.col("n_nationkey").alias("bracket_id"),
        (F.lit(-1000.0) + F.col("n_nationkey") * 440.0).alias("lo"),
        (F.lit(-300.0) + F.col("n_nationkey") * 440.0).alias("hi"),
    )
    pairs = range_join(c, iv, "c_acctbal", "lo", "hi", bucket_width=700.0)
    return pairs.groupBy("bracket_id").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).cast("double").alias("acctbal_sum"),
    )


@query(
    "hll_weekly_distinct_users",
    oracle="""
    WITH exact AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1)
    SELECT week, n_exact, CAST(1 AS INT) AS est_ok FROM exact
    """,
)
def hll_weekly_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch invariant entry (functions/sketches.py): daily
    HLL sketches of user_id union into weekly estimates WITHOUT raw
    re-aggregation; each estimate must land within 5% of the exact
    weekly distinct count (HLL rsd at lgConfigK=12 is ~1.6%).  The
    oracle carries the exact counts; est_ok encodes the tolerance
    verdict, so a drifting sketch implementation goes red."""
    from gofast_spark.functions import distinct_rollup

    e = _t(spark, sf_dir, "events")
    daily = e.select(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    )
    est = distinct_rollup(
        daily, ["week", "day"], ["week"], "user_id", out_col="est"
    )
    exact = daily.groupBy("week").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return exact.join(est, "week").select(
        "week",
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        )
        .cast("int")
        .alias("est_ok"),
    )


@query(
    "json_props_extract_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(round(avg(CAST(props->>'k' AS BIGINT)), 4) AS DOUBLE) AS k_avg,
           CAST(count(CASE WHEN CAST(props->>'k' AS BIGINT) >= 50
                           THEN 1 END) AS BIGINT) AS n_high
    FROM events GROUP BY event_type
    """,
)
def json_props_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column path: the events ``props`` JSON string is
    parsed with a DECLARED schema (``from_json`` — typed, codegen'd,
    null-safe on malformed rows; never a Python JSON loop) and the
    extracted field aggregates by event type.  DuckDB extracts the same
    path with its JSON operators."""
    e = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        e.withColumn("__k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__k").alias("k_sum"),
            F.round(F.avg("__k"), 4).cast("double").alias("k_avg"),
            F.count(F.when(F.col("__k") >= 50, 1)).alias("n_high"),
        )
    )


@query(
    "skew_report_events",
    oracle="""
    WITH c AS (SELECT event_type, count(*) AS n_rows FROM events
               GROUP BY event_type),
    t AS (SELECT sum(n_rows) AS total, count(*) AS n_keys FROM c)
    SELECT c.event_type,
           c.n_rows,
           CAST(round(c.n_rows * 1.0 / t.total, 6) AS DOUBLE) AS share,
           CAST(round(c.n_rows / (t.total * 1.0 / t.n_keys), 6) AS DOUBLE)
             AS uniform_ratio,
           CAST(row_number() OVER (ORDER BY c.n_rows DESC, c.event_type)
                AS INTEGER) AS rank
    FROM c, t
    QUALIFY rank <= 3
    """,
)
def skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (operators/skew.py:skew_report): top heavy
    hitters with share and uniform-ratio, one aggregation pass with the
    totals on a broadcast single-row cross join."""
    from gofast_spark.operators import skew_report

    e = _t(spark, sf_dir, "events")
    out = skew_report(e, "event_type", top_k=3)
    return out.select(
        "event_type",
        "n_rows",
        F.round("share", 6).cast("double").alias("share"),
        F.round("uniform_ratio", 6).cast("double").alias("uniform_ratio"),
        F.col("rank").cast("int").alias("rank"),
    )


@query(
    "cumsum_orders_revenue",
    oracle="""
    SELECT o_orderkey,
           CAST(round(sum(o_totalprice) OVER (ORDER BY o_orderkey
                ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_revenue
    FROM orders
    """,
)
def cumsum_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed prefix sum over a real fact table: running revenue in
    o_orderkey order via the two-phase parallel scan
    (operators/prefix.py) — range repartition, partition-local sums,
    broadcast offsets; the oracle is an ordinary single-node window.
    Note the value column is integer-micro-unit money scaled back, so
    the regrouped additions stay exact."""
    from gofast_spark.operators import distributed_cumsum

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        # integer micro-units: double addition of (price * 100) ints is
        # exact below 2^53, so partition regrouping cannot drift
        F.round(F.col("o_totalprice") * 100).alias("__cents"),
    )
    out = distributed_cumsum(o, "o_orderkey", "__cents", out_col="__cum")
    return out.select(
        "o_orderkey",
        F.round(F.col("__cum") / 100.0, 2).cast("double").alias(
            "running_revenue"
        ),
    )


@query(
    "hist_sketch_rollup_events",
    oracle="""
    SELECT event_type,
           CAST(greatest(0, least(63, floor(value / 8.0))) AS INT) AS bin,
           count(*) AS cnt
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, bin
    """,
)
def hist_sketch_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-grid histogram (functions/sketches.py): DAILY
    (day, event_type) sketches re-summed up to event_type must equal
    the histogram built from raw data directly — the merge-exactness
    property that lets 100-TB percentile dashboards aggregate sketch
    rows instead of raw rows.  The oracle computes the direct
    histogram; the Spark side answers through the daily->rollup path,
    so the equality is verified differentially.  Bin width 8 over
    [0, 512) is a power of two: every float step is exact."""
    from gofast_spark.functions.sketches import (
        histogram_rollup,
        value_histogram,
    )

    e = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
        "value",
    )
    daily = value_histogram(
        e, ["day", "event_type"], "value", lo=0.0, hi=512.0, bins=64
    )
    return histogram_rollup(daily, ["event_type"])


@query(
    "hist_quantile_events",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(greatest(0, least(63, floor(value / 8.0))) AS INT) AS bin,
             count(*) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, bin),
    c AS (
      SELECT event_type, bin,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM b),
    qv AS (SELECT unnest([0.5, 0.9]) AS q)
    SELECT event_type, q,
           CAST((min(bin) + 1) * 8.0 AS DOUBLE) AS est
    FROM c CROSS JOIN qv
    WHERE cum >= q * total
    GROUP BY event_type, q
    """,
)
def hist_quantile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates (p50/p90 per event_type) answered from the
    merged histogram sketch: upper edge of the first bin reaching the
    target cumulative mass, error bounded by one 8-unit bin.  The
    cumulative window runs over at most 64 rows per group — never a
    single-reducer data sort."""
    from gofast_spark.functions.sketches import (
        histogram_quantile,
        histogram_rollup,
        value_histogram,
    )

    e = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
        "value",
    )
    daily = value_histogram(
        e, ["day", "event_type"], "value", lo=0.0, hi=512.0, bins=64
    )
    merged = histogram_rollup(daily, ["event_type"])
    return histogram_quantile(
        merged, ["event_type"], [0.5, 0.9], lo=0.0, hi=512.0, bins=64
    )


@query(
    "hll_intersection_floor_events",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase'),
    u AS (SELECT user_id FROM a UNION SELECT user_id FROM b),
    i AS (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
    SELECT (SELECT count(*) FROM a) AS exact_a,
           (SELECT count(*) FROM b) AS exact_b,
           (SELECT count(*) FROM u) AS exact_union,
           (SELECT count(*) FROM i) AS exact_both,
           CAST(1 AS INT) AS within_tol
    """,
)
def hll_intersection_floor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch-algebra audience overlap (functions/sketches.py
    distinct_intersection_estimate): |view ∩ purchase| by
    inclusion-exclusion over mergeable sketches — one pass, kilobyte
    state, vs the exact path's two distinct-shuffles plus an
    intersect.  Floor-check oracle (the ivf_kmeans_recall_floor
    pattern): exact cohort sizes hash-checked, and the sketch estimate
    must land within 5% of the union (+10 absolute) of the exact
    intersection — an accuracy regression flips the flag and fails the
    hash."""
    from gofast_spark.functions.sketches import (
        distinct_intersection_estimate,
    )

    e = _t(spark, sf_dir, "events")
    est = distinct_intersection_estimate(
        e, "user_id",
        F.col("event_type") == "view",
        F.col("event_type") == "purchase",
    )
    exact = e.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_b"),
        F.countDistinct(
            F.when(
                F.col("event_type").isin("view", "purchase"),
                F.col("user_id"),
            )
        ).alias("exact_union"),
    )
    both = (
        e.where(F.col("event_type") == "view")
        .select("user_id")
        .intersect(
            e.where(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    return (
        exact.crossJoin(F.broadcast(both))
        .crossJoin(F.broadcast(est))
        .select(
            "exact_a", "exact_b", "exact_union", "exact_both",
            (
                F.abs(F.col("est_intersection") - F.col("exact_both"))
                <= F.col("exact_union") * 0.05 + 10
            ).cast("int").alias("within_tol"),
        )
    )


@query(
    "abc_analysis_parts",
    oracle="""
    WITH per AS (
      SELECT l_partkey AS key,
             sum(CAST(trunc(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS value_c
      FROM lineitem
      WHERE l_partkey IS NOT NULL AND l_extendedprice IS NOT NULL
      GROUP BY l_partkey),
    t AS (SELECT sum(value_c) AS tot FROM per),
    cum AS (
      SELECT key, value_c,
             sum(value_c) OVER (ORDER BY value_c DESC, key
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / CAST(tot AS DOUBLE) AS cum_share
      FROM per, t),
    cls AS (
      SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc,
             value_c
      FROM cum),
    r AS (SELECT abc, count(*) AS n_keys,
                 CAST(sum(value_c) AS BIGINT) AS class_value_c
          FROM cls GROUP BY abc),
    rt AS (SELECT sum(class_value_c) AS tot FROM r)
    SELECT abc, n_keys, class_value_c,
           CAST(round(class_value_c / CAST(rt.tot AS DOUBLE), 6) AS DOUBLE)
             AS class_share
    FROM r, rt
    """,
)
def abc_analysis_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue classification of parts
    (operators/pareto.py; the 80/95 contribution split): exact cent
    sums per part from one fact groupBy, deterministic (value DESC,
    key) cumulative share over the dimension-sized frame, 3-class
    report — "which 20% of parts are 80% of revenue".  The oracle
    replays the window and classification."""
    from gofast_spark.operators.pareto import abc_analysis

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    cls = abc_analysis(li, "l_partkey", "l_extendedprice")
    total = cls.agg(F.sum("value_c").alias("__t"))
    return (
        cls.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("value_c").cast("bigint").alias("class_value_c"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "abc", "n_keys", "class_value_c",
            F.round(
                F.col("class_value_c") / F.col("__t").cast("double"), 6
            ).cast("double").alias("class_share"),
        )
    )


@query(
    "skyline_quantity_price_lineitem",
    oracle="""
    WITH base AS (
      SELECT l_quantity AS q, l_extendedprice AS p FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
    per AS (SELECT q, min(p) AS p FROM base GROUP BY q),
    nat AS (SELECT q, p, count(*) AS n_at_point FROM base GROUP BY 1, 2),
    sky AS (
      SELECT q, p,
             min(p) OVER (ORDER BY q DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS best_above
      FROM per)
    SELECT sky.q AS l_quantity, sky.p AS l_extendedprice,
           CAST(n_at_point AS BIGINT) AS n_at_point
    FROM sky JOIN nat ON nat.q = sky.q AND nat.p = sky.p
    WHERE best_above IS NULL OR sky.p < best_above
    """,
)
def skyline_quantity_price_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pareto frontier of (maximize quantity, minimize price) over
    lineitem (operators/pareto.py skyline_2d; Börzsönyi et al. 2001 —
    the SKYLINE operator): distinct-value rollup + one running-min
    window, never a pairwise dominance join."""
    from gofast_spark.operators.pareto import skyline_2d

    return skyline_2d(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )
