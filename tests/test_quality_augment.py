"""Behavior tests for the augmentation / noise / cleanup quality ops
(the stochastic ones the oracle can't check)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_augment_data_row_counts_and_jitter(spark):
    from gofast_spark.quality import augment_data

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["id", "v"])
    out = augment_data(df, fraction=0.5, noise_std=0.01, seed=7)
    n = out.count()
    assert n > 100  # originals plus a bootstrap sample
    # originals are untouched
    base = out.groupBy("id").agg(F.min("v").alias("mn")).collect()
    assert all(abs(r["mn"] - r["id"]) < 0.5 for r in base)


def test_add_noises_bounds(spark):
    from gofast_spark.quality import add_noises_to

    df = spark.createDataFrame([(i, 0.0) for i in range(1000)], ["id", "v"])
    out = add_noises_to(df, ["v"], noise="uniform", scale=0.5, seed=1)
    stats = out.agg(F.min("v"), F.max("v"), F.avg("v")).first()
    assert -0.5 <= stats[0] and stats[1] <= 0.5
    assert abs(stats[2]) < 0.1  # roughly centered


def test_cleaner_keep_drop_and_names(spark):
    from gofast_spark.quality import cleaner

    df = spark.createDataFrame([(1, 2, 3)], ["A Col", "b", "c"])
    kept = cleaner(df, columns=["A Col", "b"], mode="keep")
    assert kept.columns == ["a_col", "b"]
    dropped = cleaner(df, columns=["c"], mode="drop", sanitize_names=False)
    assert dropped.columns == ["A Col", "b"]
