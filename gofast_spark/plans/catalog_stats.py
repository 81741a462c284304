"""Catalog entries for inferential statistics (SURVEY §2.10) and the
§2.13 callable-agg escape hatch.  The oracles verify the distributed
*statistics* (sufficient-statistic formulas replayed in SQL); p-values are
scalar scipy lookups on the driver and are exercised in unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import _t, query


@query(
    "callable_agg_range_events",
    oracle="""
    SELECT event_type,
           CAST(round(max(value) - min(value), 4) AS DOUBLE) AS value_value_range
    FROM events GROUP BY event_type
    """,
)
def callable_agg_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Callable agg spec -> GROUPED_AGG pandas UDF (§2.13; reference
    contract gofast/utils/data_utils.py:1416-1424), verified against the
    closed-form max-min oracle."""
    from gofast_spark.operators import group_and_aggregate

    def value_range(s):
        return s.max() - s.min()

    e = _t(spark, sf_dir, "events")
    out = group_and_aggregate(e, "event_type", {"value": value_range})
    return out.select(
        "event_type",
        F.round("value_value_range", 4).cast("double").alias("value_value_range"),
    )


@query(
    "t_test_click_error",
    oracle="""
    WITH s AS (
      SELECT event_type, count(value) AS n, avg(value) AS mu, var_samp(value) AS s2
      FROM events WHERE event_type IN ('click', 'error') GROUP BY 1)
    SELECT CAST(round(
             (a.mu - b.mu) / sqrt(
               (((a.n - 1) * a.s2 + (b.n - 1) * b.s2) / (a.n + b.n - 2))
               * (1.0 / a.n + 1.0 / b.n)), 6) AS DOUBLE) AS t_stat,
           CAST(a.n + b.n - 2 AS DOUBLE) AS dof,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
    FROM s a, s b WHERE a.event_type = 'click' AND b.event_type = 'error'
    """,
)
def t_test_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-sample t statistic (t_test_independent,
    gofast/stats/inferential.py:388) as one aggregate + projection."""
    from gofast_spark.stats import t_test_independent

    e = _t(spark, sf_dir, "events")
    out = t_test_independent(e, "value", "event_type", "click", "error")
    return out.select(
        F.round("t_stat", 6).cast("double").alias("t_stat"),
        "dof",
        "n_a",
        "n_b",
    )


@query(
    "anova_events",
    oracle="""
    WITH per AS (
      SELECT event_type, count(value) AS n, avg(value) AS mu, var_samp(value) AS s2
      FROM events GROUP BY 1),
    s AS (
      SELECT count(*) AS k, sum(n) AS N, sum(n * mu) / sum(n) AS grand,
             sum(n * mu * mu) AS sum_nmu2, sum((n - 1) * s2) AS ssw
      FROM per)
    SELECT CAST(round(((sum_nmu2 - N * grand * grand) / (k - 1)) / (ssw / (N - k)), 6) AS DOUBLE) AS f_stat,
           CAST(k - 1 AS BIGINT) AS dof_between,
           CAST(N - k AS BIGINT) AS dof_within,
           CAST(k AS BIGINT) AS n_groups
    FROM s
    """,
)
def anova_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic (anova_test,
    gofast/stats/inferential.py:1605)."""
    from gofast_spark.stats import anova_test

    e = _t(spark, sf_dir, "events")
    out = anova_test(e, "value", "event_type")
    return out.select(
        F.round("f_stat", 6).cast("double").alias("f_stat"),
        "dof_between",
        "dof_within",
        "n_groups",
    )


@query(
    "chi2_events_type_bucket",
    oracle="""
    WITH t AS (SELECT event_type AS a, CAST(floor(value / 20) AS INTEGER) AS b FROM events),
    obs AS (SELECT a, b, count(*) AS o FROM t GROUP BY a, b),
    rm AS (SELECT a, sum(o) AS ra FROM obs GROUP BY a),
    cm AS (SELECT b, sum(o) AS cb FROM obs GROUP BY b),
    n AS (SELECT sum(o) AS N FROM obs)
    SELECT CAST(round(sum(pow(o - ra * cb / N, 2) / (ra * cb / N)), 6) AS DOUBLE) AS chi2,
           CAST((SELECT count(*) FROM rm) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM cm) - 1 AS BIGINT) AS dof
    FROM obs JOIN rm USING (a) JOIN cm USING (b), n
    """,
)
def chi2_events_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence over event_type x value-bucket (chi2_test,
    gofast/stats/inferential.py:1496)."""
    from gofast_spark.stats import chi2_test

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") / 20).cast("int").alias("vbucket"),
    )
    out = chi2_test(e, "event_type", "vbucket")
    return out.select(
        F.round("chi2", 6).cast("double").alias("chi2"), F.col("dof")
    )


@query(
    "ks_test_purchase_view",
    oracle="""
    WITH sub AS (
      SELECT value AS x,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
      FROM events WHERE event_type IN ('purchase', 'view')),
    pv AS (SELECT x, sum(ia) AS ca, sum(ib) AS cb FROM sub GROUP BY x),
    c AS (
      SELECT sum(ca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / sum(ca) OVER () AS fa,
             sum(cb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / sum(cb) OVER () AS fb,
             sum(ca) OVER () AS n_a, sum(cb) OVER () AS n_b
      FROM pv)
    SELECT CAST(round(max(abs(fa - fb)), 6) AS DOUBLE) AS ks_stat,
           CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b
    FROM c
    """,
)
def ks_test_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS D statistic via cumulative-count ECDFs (ks_test,
    gofast/stats/inferential.py:1173)."""
    from gofast_spark.stats import ks_test_2samp

    e = _t(spark, sf_dir, "events")
    out = ks_test_2samp(e, "value", "event_type", "purchase", "view")
    return out.select(
        F.round("ks_stat", 6).cast("double").alias("ks_stat"), "n_a", "n_b"
    )
