"""Quantile-sketch pre-binning for the midrank family (VERDICT r5 #5):
exactness contract below the bins threshold, bounded cardinality above
it, approximation quality, and null/NaN pass-through."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gofast_spark.stats.prebin import prebin_column


def _cont(spark, n=5000, seed=11):
    # continuous column: distinct ~= n
    return (
        spark.range(n)
        .withColumn("x", F.randn(seed) * 100.0)
        .withColumn("y", F.col("id").cast("double") + F.randn(seed + 1))
    )


def test_exact_path_below_threshold(spark):
    df = spark.range(1000).withColumn("x", (F.col("id") % 7).cast("double"))
    out = prebin_column(df, "x", bins=64)
    assert out.select("x").exceptAll(df.select("x")).count() == 0


def test_bins_none_is_identity(spark):
    df = _cont(spark)
    assert prebin_column(df, "x", bins=None) is df


def test_bounded_cardinality_and_order(spark):
    df = _cont(spark)
    out = prebin_column(df, "x", bins=32)
    d = out.select("x").distinct().count()
    assert d <= 33
    # order-preserving: binned value is monotone in the raw value
    rows = (
        prebin_column(df.withColumn("raw", F.col("x")), "x", bins=32)
        .select("raw", "x")
        .collect()
    )
    rows.sort(key=lambda r: r.raw)
    binned = [r.x for r in rows]
    assert all(b2 >= b1 for b1, b2 in zip(binned, binned[1:]))


def test_null_nan_passthrough(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(500)] + [(None,), (float("nan"),)],
        "x double",
    )
    out = prebin_column(df, "x", bins=16).collect()
    vals = [r.x for r in out]
    assert any(v is None for v in vals)
    assert any(v is not None and math.isnan(v) for v in vals)


def test_spearman_binned_close_to_exact(spark):
    from gofast_spark.stats import spearman_corr

    df = _cont(spark)
    exact = spearman_corr(df, "x", "y").collect()[0]["spearman"]
    binned = spearman_corr(df, "x", "y", bins=64).collect()[0]["spearman"]
    assert abs(exact - binned) < 0.05


def test_ks_binned_close_to_exact(spark):
    from gofast_spark.stats.inferential import ks_test_2samp

    df = (
        spark.range(4000)
        .withColumn("g", F.when(F.col("id") % 2 == 0, "a").otherwise("b"))
        .withColumn(
            "v",
            F.randn(5) + F.when(F.col("g") == "a", 0.5).otherwise(0.0),
        )
    )
    exact = ks_test_2samp(df, "v", "g", "a", "b").collect()[0]["ks_stat"]
    binned = ks_test_2samp(df, "v", "g", "a", "b", bins=64).collect()[0][
        "ks_stat"
    ]
    assert abs(exact - binned) < 0.05


def test_bins_lt_two_raises(spark):
    df = _cont(spark, n=100)
    with pytest.raises(ValueError):
        prebin_column(df, "x", bins=1)


def test_auto_exact_below_threshold(spark):
    from gofast_spark.stats.prebin import prebin_column

    df = _cont(spark, n=2000)
    out = prebin_column(df, "x", bins="auto")
    assert out.select("x").distinct().count() == df.select("x").distinct().count()


def test_auto_engages_above_threshold(spark):
    from gofast_spark.stats.prebin import _AUTO_BINS, prebin_column

    df = spark.range(150_000).select(
        (F.col("id") * 0.001 + (F.col("id") % 7) * 1e-7).alias("x")
    )
    out = prebin_column(df, "x", bins="auto")
    card = out.select("x").distinct().count()
    assert card <= _AUTO_BINS * 1.05, card


def test_auto_default_flows_through_midrank_family(spark):
    """The default bins='auto' must keep moderate-cardinality stats exact
    (distinct << threshold): default result == explicit bins=None."""
    from gofast_spark.stats import spearman_corr

    df = _cont(spark, n=3000)
    d = spearman_corr(df, "x", "y").collect()[0]["spearman"]
    e = spearman_corr(df, "x", "y", bins=None).collect()[0]["spearman"]
    assert d == e


def test_bins_bad_string_raises(spark):
    from gofast_spark.stats.prebin import prebin_column

    df = _cont(spark, n=100)
    with pytest.raises(ValueError):
        prebin_column(df, "x", bins="always")
