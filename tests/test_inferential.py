"""Inferential statistics vs scipy on collected samples (the reference's
own implicit test: it wraps scipy).  scipy is optional in this
environment — the oracle catalog still verifies the statistics vs DuckDB;
these tests add the p-value path where scipy exists."""

from __future__ import annotations

import os

import pytest

scipy_stats = pytest.importorskip("scipy.stats")


@pytest.fixture(scope="module")
def events(spark, sf_small):
    return spark.read.parquet(os.path.join(sf_small, "events.parquet")).select(
        "event_type", "value"
    )


def test_t_test_matches_scipy(spark, events):
    from gofast_spark.stats import t_test_independent, t_test_p_value

    row = t_test_independent(events, "value", "event_type", "click", "error").first()
    pdf = events.toPandas()
    a = pdf[pdf.event_type == "click"].value
    b = pdf[pdf.event_type == "error"].value
    ref = scipy_stats.ttest_ind(a, b)
    assert abs(row["t_stat"] - ref.statistic) < 1e-9
    p = t_test_p_value(row)
    assert p is not None and abs(p - ref.pvalue) < 1e-9


def test_welch_t_matches_scipy(spark, events):
    from gofast_spark.stats import t_test_independent

    row = t_test_independent(
        events, "value", "event_type", "click", "error", equal_var=False
    ).first()
    pdf = events.toPandas()
    a = pdf[pdf.event_type == "click"].value
    b = pdf[pdf.event_type == "error"].value
    ref = scipy_stats.ttest_ind(a, b, equal_var=False)
    assert abs(row["t_stat"] - ref.statistic) < 1e-9


def test_anova_matches_scipy(spark, events):
    from gofast_spark.stats import anova_test

    row = anova_test(events, "value", "event_type").first()
    pdf = events.toPandas()
    groups = [g.value.values for _, g in pdf.groupby("event_type")]
    ref = scipy_stats.f_oneway(*groups)
    assert abs(row["f_stat"] - ref.statistic) < 1e-6


def test_ks_matches_scipy(spark, events):
    from gofast_spark.stats import ks_test_2samp

    row = ks_test_2samp(events, "value", "event_type", "purchase", "view").first()
    pdf = events.toPandas()
    a = pdf[pdf.event_type == "purchase"].value
    b = pdf[pdf.event_type == "view"].value
    ref = scipy_stats.ks_2samp(a, b)
    assert abs(row["ks_stat"] - ref.statistic) < 1e-9


def test_chi2_matches_scipy(spark, events):
    import pandas as pd
    from pyspark.sql import functions as F

    from gofast_spark.stats import chi2_test

    df = events.select(
        "event_type", F.floor(F.col("value") / 20).cast("int").alias("b")
    )
    row = chi2_test(df, "event_type", "b").first()
    pdf = df.toPandas()
    tab = pd.crosstab(pdf.event_type, pdf.b)
    ref = scipy_stats.chi2_contingency(tab, correction=False)
    assert abs(row["chi2"] - ref.statistic) < 1e-6
    assert row["dof"] == ref.dof


