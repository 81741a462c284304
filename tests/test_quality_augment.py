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


def test_has_duplicates_and_alias(spark):
    from gofast_spark.quality import handle_nans, has_duplicates

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, None)], ["k", "v"]
    )
    assert has_duplicates(df)
    assert not has_duplicates(df.dropDuplicates())
    assert has_duplicates(df, subset=["k"])
    # alias routes to handle_missing_data
    out = handle_nans(df, "drop_rows", columns=["v"]).collect()
    assert len(out) == 3


def test_outlier_handler_fit_transform_split(spark):
    """Bounds learned on train must apply unchanged to test."""
    from gofast_spark.quality import OutlierHandler

    train = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], ["x"]
    )
    test = spark.createDataFrame([(0.5,), (50.0), (1000.0,)][::2], ["x"])
    h = OutlierHandler(["x"], method="iqr", factor=1.5).fit(train)
    lo, hi = h.bounds_["x"]
    # q1=25.75, q3=75.25, iqr=49.5 -> bounds (-48.5, 149.5) with exact percentile
    assert lo < 1 and hi > 100
    got = sorted(r["x"] for r in h.transform(test).collect())
    assert got[-1] == hi  # 1000 clipped to the TRAIN upper bound


def test_handle_unique_identifiers_transform_func(spark):
    from gofast_spark.quality import handle_unique_identifiers

    df = spark.createDataFrame(
        [(i, "x") for i in range(50)], ["uid", "const"]
    )
    out = handle_unique_identifiers(
        df, threshold=0.9, action="transform",
        transform_func=lambda c: c % 10, approx=False,
    )
    vals = {r["uid"] for r in out.collect()}
    assert vals == set(range(10))  # uid folded, const untouched
    assert out.columns == ["uid", "const"]


def test_benford_profile_digits_and_chi2(spark):
    from pyspark.sql import functions as F

    from gofast_spark.quality import benford_profile

    # exact Benford sample: counts proportional to log10(1 + 1/d)
    import math

    rows = []
    for d in range(1, 10):
        n = round(1000 * math.log10(1 + 1 / d))
        rows += [(float(f"{d}23.45"),)] * n
    rows += [(None,), (0.0,), (-0.0,)]  # excluded
    df = spark.createDataFrame(rows, ["v"])
    out = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    total = sum(r["n"] for r in out.values())
    assert total == sum(
        round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)
    )
    # near-perfect Benford -> tiny chi2
    chi2 = sum(r["chi2_term"] for r in out.values())
    assert chi2 < 1.0, chi2
    # scientific-notation magnitudes still classify by mantissa digit
    tiny = spark.createDataFrame([(3e-9,), (7e12,)], ["v"])
    got = sorted(r["digit"] for r in benford_profile(tiny, "v").collect())
    assert got == [3, 7]
