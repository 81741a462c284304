"""Catalog entries for the §2.6 sampling family and §2.7 reshape gaps —
all deterministic via the engine-portable LCG key hash, so DuckDB replays
every assignment exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.operators.sampling import _LCG_A, _LCG_C, _LCG_M
from gofast_spark.plans.catalog import _t, query


def _bucket_sql(key: str, buckets: int, seed: int = 0) -> str:
    return f"((({key} + {seed}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}) % {buckets}"


@query(
    "batch_sampling_counts",
    oracle=f"""
    SELECT event_type,
           CAST({_bucket_sql('user_id', 4)} AS BIGINT) AS batch_id,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def batch_sampling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic batch assignment (batch_sampling,
    gofast/utils/data_utils.py:5677)."""
    from gofast_spark.operators.sampling import batch_sampling

    e = _t(spark, sf_dir, "events")
    out = batch_sampling(e, "user_id", n_batches=4)
    return out.groupBy("event_type", "batch_id").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "spatial_sampling_customers",
    oracle=f"""
    SELECT c_custkey,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) || '_' ||
             CAST(floor(c_nationkey / 5.0) AS BIGINT) AS cell
    FROM customer
    WHERE {_bucket_sql('c_custkey', 100)} < 20
    """,
)
def spatial_sampling_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-stratified deterministic sampling (spatial_sampling,
    gofast/utils/spatial_utils.py:3236)."""
    from gofast_spark.operators.sampling import spatial_sampling

    c = _t(spark, sf_dir, "customer")
    out = spatial_sampling(
        c, "c_acctbal", "c_nationkey", "c_custkey",
        cell_size=1000.0, fraction=0.2, cell_col="cell",
    )
    # cell_size applies to x; y uses the same δ — mirror a 2-scale cell by
    # recomputing for the oracle's (1000, 5) grid
    out = out.withColumn(
        "cell",
        F.concat_ws(
            "_",
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint"),
            F.floor(F.col("c_nationkey") / 5.0).cast("bigint"),
        ),
    )
    return out.select("c_custkey", "cell")


@query(
    "split_data_counts",
    oracle=f"""
    WITH b AS (SELECT {_bucket_sql('o_orderkey', 100)} AS bkt FROM orders)
    SELECT 'part_0' AS part, count(*) AS n FROM b WHERE bkt < 60
    UNION ALL
    SELECT 'part_1', count(*) FROM b WHERE bkt >= 60
    """,
)
def split_data_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ratio split (split_data,
    gofast/dataops/transformation.py:206) — contiguous hash-bucket
    ranges."""
    from gofast_spark.operators.sampling import split_data

    o = _t(spark, sf_dir, "orders")
    parts = split_data(o, [0.6, 0.4], key="o_orderkey", seed=0)
    counted = [
        p.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(f"part_{i}").alias("part"), "n"
        )
        for i, p in enumerate(parts)
    ]
    return counted[0].unionByName(counted[1])


@query(
    "repeat_region_across_nation",
    oracle="""
    SELECT n_nationkey, r_regionkey, r_name
    FROM (SELECT DISTINCT n_nationkey FROM nation) CROSS JOIN region
    """,
)
def repeat_region_across_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature replication across a spine (repeat_feature_accross,
    gofast/utils/data_utils.py:5197) — broadcast cross join."""
    from gofast_spark.operators.reshape import repeat_feature_accross

    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    out = repeat_feature_accross(n, r, spine_col="n_nationkey")
    return out.select("n_nationkey", "r_regionkey", "r_name")


@query(
    "generate_comparison_orders",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS o_totalprice_left,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS o_totalprice_right,
           (o_orderkey % 3) <> 0 AS o_totalprice_equal
    FROM orders
    """,
)
def generate_comparison_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aligned diff of two frames (generate_comparison,
    gofast/utils/data_utils.py:647): full-outer join on the key with
    per-column equality flags."""
    from gofast_spark.operators.reshape import generate_comparison

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    modified = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1000.0
        ).otherwise(F.col("o_totalprice")),
    )
    out = generate_comparison(o, modified, "o_orderkey", ["o_totalprice"])
    return out.select(
        "o_orderkey", "o_totalprice_left", "o_totalprice_right", "o_totalprice_equal"
    )


@query(
    "frame_union_customer",
    oracle="""
    SELECT c_custkey, c_acctbal, round(c_acctbal * 2, 2) AS c_acctbal_1
    FROM customer
    """,
)
def frame_union_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-wise feature union with collision suffixing (FrameUnion,
    gofast/transformers/feature_engineering.py:3525)."""
    from gofast_spark.operators.reshape import frame_union

    c = _t(spark, sf_dir, "customer")
    a = c.select("c_custkey", "c_acctbal")
    b = c.select(
        "c_custkey", F.round(F.col("c_acctbal") * 2, 2).alias("c_acctbal")
    )
    out = frame_union([a, b], on="c_custkey")
    return out.select("c_custkey", "c_acctbal", "c_acctbal_1")


@query(
    "temperature_mixture_documents",
    oracle="""
    WITH avail AS (
      SELECT source, count(*) AS available FROM documents GROUP BY source),
    nrm AS (SELECT sum(pow(available, 0.7)) AS z FROM avail)
    SELECT source, CAST(available AS BIGINT) AS available,
           CAST(round(pow(available, 0.7) / z * 1000.0, 6) AS DOUBLE)
             AS target_weight,
           CAST(round(pow(available, 0.7) / z * 1000.0 / available, 6)
             AS DOUBLE) AS rate
    FROM avail CROSS JOIN nrm
    """,
)
def temperature_mixture_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture rates (operators/mixture.py,
    exponent-smoothed multi-source sampling, T=0.7, budget 1000 rows):
    per-source availability aggregate + 1-row normalizer broadcast —
    no domain dict ever collected, so the source set may be unbounded."""
    from gofast_spark.operators.mixture import temperature_mixture_rates

    d = _t(spark, sf_dir, "documents")
    out = temperature_mixture_rates(
        d, "source", F.lit(1), temperature=0.7, budget=1000.0
    )
    return out.select(
        "source",
        F.col("available").cast("bigint").alias("available"),
        F.round("target_weight", 6).cast("double").alias("target_weight"),
        F.round("rate", 6).cast("double").alias("rate"),
    )


def _temp_sample_oracle() -> str:
    from gofast_spark.operators.mixture import uniform_hash_sql

    u = uniform_hash_sql("d.doc_id", seed=42)
    return f"""
    WITH avail AS (
      SELECT source, count(*) AS available FROM documents GROUP BY source),
    nrm AS (SELECT sum(pow(available, 0.7)) AS z FROM avail),
    r AS (
      SELECT source, pow(available, 0.7) / z * 1000.0 / available AS rate
      FROM avail CROSS JOIN nrm),
    j AS (
      SELECT d.doc_id, d.source, r.rate, {u} AS u
      FROM documents d JOIN r USING (source)),
    c AS (
      SELECT source,
             CAST(floor(rate) + CASE WHEN u < rate - floor(rate)
                  THEN 1 ELSE 0 END AS BIGINT) AS n
      FROM j)
    SELECT source, CAST(sum(n) AS BIGINT) AS n_rows
    FROM c WHERE n > 0 GROUP BY source
    """


@query("temperature_sampled_counts", oracle=_temp_sample_oracle())
def temperature_sampled_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END temperature rebalancing: the T=0.7 rates frame feeds
    mixture_sample directly (rates never leave the plan — no dict
    collect) and the sampled corpus is counted per source.  Verifies
    the rate computation AND the replication arithmetic composed."""
    from gofast_spark.operators.mixture import (
        mixture_sample,
        temperature_mixture_rates,
    )

    d = _t(spark, sf_dir, "documents")
    rates = temperature_mixture_rates(
        d, "source", F.lit(1), temperature=0.7, budget=1000.0
    )
    out = mixture_sample(d, "source", rates, "doc_id", seed=42)
    return out.groupBy("source").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "weighted_sample_customers",
    oracle="""
    WITH w AS (
      SELECT c_custkey, c_acctbal,
             ((CAST('0x' || substr(md5('7|' || CAST(c_custkey AS VARCHAR)),
                                   1, 15) AS BIGINT) % 2147483648)
              / CAST(2147483648 AS DOUBLE)) AS u
      FROM customer WHERE c_acctbal IS NOT NULL AND c_acctbal > 0),
    keyed AS (
      SELECT c_custkey, c_acctbal,
             ln((u * 2147483648 + 1.0) / CAST(2147483649 AS DOUBLE))
               / CAST(c_acctbal AS DOUBLE) AS es
      FROM w)
    SELECT c_custkey, c_acctbal
    FROM keyed ORDER BY es DESC, c_custkey LIMIT 20
    """,
)
def weighted_sample_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis 2006,
    operators/sampling.py weighted_sample): 20 customers drawn with
    probability proportional to positive account balance, via the
    exponential-key top-k over a portable md5 uniform — one
    TakeOrderedAndProject, reproducible on any partitioning.  The
    oracle replays key construction and ordering verbatim."""
    from gofast_spark.operators.sampling import weighted_sample

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return weighted_sample(c, "c_custkey", "c_acctbal", k=20, seed=7)


@query(
    "weighted_sample_per_segment",
    oracle="""
    WITH w AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             ((CAST('0x' || substr(md5('7|' || CAST(c_custkey AS VARCHAR)),
                                   1, 15) AS BIGINT) % 2147483648)
              / CAST(2147483648 AS DOUBLE)) AS u
      FROM customer WHERE c_acctbal IS NOT NULL AND c_acctbal > 0),
    keyed AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY
               ln((u * 2147483648 + 1.0) / CAST(2147483649 AS DOUBLE))
                 / CAST(c_acctbal AS DOUBLE) DESC, c_custkey) AS rn
      FROM w)
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM keyed WHERE rn <= 5
    """,
)
def weighted_sample_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified weighted sampling (operators/sampling.py
    weighted_sample_per_group): an independent Efraimidis-Spirakis draw
    of 5 customers per market segment, balance-weighted — balanced
    per-stratum subsets with one rank window, replayed verbatim by the
    oracle."""
    from gofast_spark.operators.sampling import weighted_sample_per_group

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return weighted_sample_per_group(
        c, "c_custkey", "c_acctbal", "c_mktsegment", k=5, seed=7
    )


@query(
    "neyman_sample_orders",
    oracle="""
    WITH d AS (
      SELECT o_orderkey, o_orderpriority AS h,
             CAST(o_totalprice AS DOUBLE) AS v
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
    q AS (
      SELECT o_orderkey, h, v,
             CAST(floor(v * 1000.0 + 0.5) AS BIGINT) AS x3
      FROM d),
    per AS (
      SELECT h, count(*) AS n_h, sum(x3) AS s_h,
             sum(CAST(x3 AS HUGEINT) * x3) AS ss_h
      FROM q GROUP BY h),
    w AS (
      SELECT h, n_h,
             CAST(n_h AS DOUBLE)
               * CASE WHEN n_h > 1
                      THEN sqrt((CAST(ss_h AS DOUBLE)
                                 - CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)
                                   / CAST(n_h AS DOUBLE))
                                / (CAST(n_h AS DOUBLE) - 1.0) / 1000000.0)
                      ELSE 0.0 END AS w_h
      FROM per),
    c AS (
      SELECT h, n_h, w_h,
             sum(w_h) OVER (ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      FROM w),
    ws AS (SELECT cw AS wsum FROM c ORDER BY h DESC LIMIT 1),
    rates AS (
      SELECT h, least(1.0, 1000.0 * w_h / wsum / CAST(n_h AS DOUBLE))
               AS rate
      FROM w, ws),
    sampled AS (
      SELECT q.h, q.v
      FROM q JOIN rates ON q.h = rates.h
      WHERE (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
               || '_ney_17'), 1, 15)) AS BIGINT) % 2147483648)
            / 2147483648.0 < rate)
    SELECT h AS o_orderpriority, count(*) AS n_sampled,
           CAST(sum(CAST(floor(v * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM sampled GROUP BY h
    """,
)
def neyman_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal-allocation stratified sample of orders by
    priority (operators/sampling.neyman_sample; Neyman JRSS 1934):
    budget 1000 split by N_h * S_h from one exact milli-unit moment
    pass, membership a pure md5-hash projection filter — deterministic,
    repartition-stable, and fully replayed by the oracle including the
    per-stratum sampled sums."""
    from gofast_spark.operators.sampling import neyman_sample

    o = _t(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
        & F.col("o_orderpriority").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    s = neyman_sample(
        o, "o_orderpriority", "o_totalprice", "o_orderkey",
        total=1000, seed=17,
    )
    return s.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(
            F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5))
            .cast("bigint")
        ).cast("bigint").alias("sum_cents"),
    )
