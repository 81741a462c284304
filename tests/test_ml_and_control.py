"""ML pipeline mirrors, rule-based QC, data assistant, and the gated
per-series offload plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_feature_pipeline_fit_transform(spark):
    from gofast_spark.ml import make_feature_pipeline

    df = spark.createDataFrame(
        [(1.0, None, "a"), (2.0, 4.0, "b"), (3.0, 6.0, "a")],
        ["x1", "x2", "cat"],
    )
    pipe = make_feature_pipeline(["x1", "x2"], ["cat"])
    model = pipe.fit(df)
    out = model.transform(df)
    assert "features" in out.columns
    vecs = [r["features"] for r in out.collect()]
    assert all(v.size >= 3 for v in vecs)  # 2 numeric + >=1 one-hot slots


def test_pca_kmeans(spark):
    from gofast_spark.ml import fit_kmeans, fit_pca, make_feature_pipeline
    from gofast_spark.sources.datasets import make_classification_data

    df = make_classification_data(spark, 200, 3, n_classes=2)
    pipe = make_feature_pipeline(["x_0", "x_1", "x_2"], scale=False)
    feats = pipe.fit(df).transform(df)
    _, reduced = fit_pca(feats, "features", 2)
    assert reduced.select("pca").first()["pca"].size == 2
    model, clustered = fit_kmeans(feats, "features", 2)
    n_clusters = clustered.select("cluster").distinct().count()
    assert n_clusters == 2


def test_quality_control_rules(spark):
    from gofast_spark.quality.control import quality_control

    df = spark.createDataFrame(
        [(1, 5.0, "AA"), (2, -1.0, "bb"), (None, 120.0, "CC")],
        ["id", "v", "code"],
    )
    report = quality_control(
        df,
        {
            "id": {"not_null": True},
            "v": {"min": 0, "max": 100},
            "code": {"pattern": "[A-Z]{2}"},
        },
    )
    got = {(r["column"], r["rule"]): r["n_violations"] for r in report.collect()}
    assert got == {
        ("id", "not_null"): 1,
        ("v", "min"): 1,
        ("v", "max"): 1,
        ("code", "pattern"): 1,
    }


def test_data_assistant_flags(spark):
    from gofast_spark.quality.control import data_assistant

    df = spark.createDataFrame(
        [(i, 1.0, None if i % 2 else 2.0) for i in range(40)],
        ["uid", "const", "holey"],
    )
    advice = data_assistant(df)
    issues = {(r["column"], r["issue"]) for r in advice.collect()}
    assert ("const", "constant") in issues
    assert ("uid", "id_like") in issues
    assert ("holey", "high_missingness") in issues


def test_savgol_gated_or_runs(spark):
    from gofast_spark.ts.decompose import savgol_smooth

    df = spark.createDataFrame(
        [("s1", f"{i:03d}", float(i % 5)) for i in range(30)],
        ["series", "t", "v"],
    )
    try:
        out = savgol_smooth(df, "series", "t", "v")
    except ImportError as e:
        assert "scipy" in str(e)
        pytest.skip("scipy not installed; gate verified")
    assert out.count() == 30
