"""Unit tests: ROC points, MAD outliers, readability."""

from __future__ import annotations

import pytest


def test_roc_points_brute_force(spark):
    from gofast_spark.metrics import roc_points

    data = [(float(i % 16), int(i % 16 >= 10)) for i in range(160)]
    df = spark.createDataFrame(data, "s double, y int")
    got = {
        r["threshold"]: r
        for r in roc_points(df, "s", "y", lo=0.0, hi=16.0, bins=16).collect()
    }
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    for thr, r in got.items():
        tp = sum(s >= thr for s in pos)
        fp = sum(s >= thr for s in neg)
        assert (r["tp"], r["fp"]) == (tp, fp), thr
        assert r["tpr"] == pytest.approx(tp / len(pos))
        assert r["fpr"] == pytest.approx(fp / len(neg))
    # monotone curve in threshold
    thrs = sorted(got)
    tprs = [got[t]["tpr"] for t in thrs]
    assert all(a >= b for a, b in zip(tprs, tprs[1:]))


def test_mad_outliers_flags_planted_point(spark):
    from gofast_spark.quality.outliers import mad_outliers

    xs = [10.0, 11.0, 9.5, 10.5, 10.2, 9.8, 10.1, 500.0]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = mad_outliers(df, "x").collect()
    flagged = {r["x"] for r in rows if r["is_outlier"] == 1}
    assert flagged == {500.0}
    # classic z-score would be dragged: check mz of the inliers is small
    for r in rows:
        if r["x"] != 500.0:
            assert abs(r["mz"]) < 3.5


def test_mad_outliers_grouped_and_zero_mad(spark):
    from gofast_spark.quality.outliers import mad_outliers

    rows = [
        ("a", x)
        for x in (10.0, 11.0, 9.5, 10.5, 10.2, 9.8, 10.1, 99.0)
    ] + [("b", 5.0)] * 8
    df = spark.createDataFrame(rows, "g string, x double")
    got = mad_outliers(df, "x", by="g").collect()
    a_flag = [r for r in got if r["g"] == "a" and r["is_outlier"] == 1]
    assert len(a_flag) == 1 and a_flag[0]["x"] == 99.0
    # group b is constant: MAD = 0 -> nothing flagged, mz = 0
    assert all(
        r["is_outlier"] == 0 and r["mz"] == 0.0
        for r in got
        if r["g"] == "b"
    )


def test_readability_simple_vs_complex(spark):
    from gofast_spark.text.analysis import readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran. It was fun."),
            (2, "Extraordinarily sophisticated considerations "
                "necessitate comprehensive organizational methodologies."),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in readability(df, "text").collect()}
    assert got[1]["n_sentences"] == 3
    assert got[1]["flesch_ease"] > got[2]["flesch_ease"]
    assert got[2]["fk_grade"] > got[1]["fk_grade"]
    assert got[1]["n_words"] == 9
    assert got[1]["n_syllables"] >= got[1]["n_words"]


def test_readability_skips_empty(spark):
    from gofast_spark.text.analysis import readability

    df = spark.createDataFrame(
        [(1, "hello world."), (2, "!!!"), (3, None)],
        "doc_id int, text string",
    )
    ids = {r["doc_id"] for r in readability(df, "text").collect()}
    assert ids == {1}
