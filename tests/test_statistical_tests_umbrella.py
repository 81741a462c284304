"""statistical_tests umbrella + paired t / Cochran Q / RM-ANOVA
(reference gofast/stats/inferential.py:1835)."""

from __future__ import annotations

import math

import pytest


def test_t_test_paired_known(spark):
    from gofast_spark.stats import t_test_paired

    # diffs: [1, 1, 1, 5] -> mean 2, sd 2, t = 2 / (2/2) = 2
    rows = [(2.0, 1.0), (3.0, 2.0), (4.0, 3.0), (9.0, 4.0)]
    out = t_test_paired(
        spark.createDataFrame(rows, ["a", "b"]), "a", "b"
    ).collect()[0]
    assert out["t_stat"] == pytest.approx(2.0)
    assert out["dof"] == 3


def test_cochran_q_known(spark):
    from gofast_spark.stats import cochran_q_test

    # classic 3-treatment binary table
    rows = [
        (1, 1, 0), (1, 1, 1), (0, 1, 0), (1, 0, 0),
        (0, 0, 0), (1, 1, 1), (1, 0, 1), (0, 1, 0),
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "x3"])
    out = cochran_q_test(df, ["x1", "x2", "x3"]).collect()[0]
    # G = (5, 5, 3), T = 13, sum L^2 = 29
    # Q = 3*2*((5-13/3)^2*2 + (3-13/3)^2) / (3*13 - 29) = 6*(8/3)/10
    assert out["cochran_q"] == pytest.approx(6 * (8.0 / 3.0) / 10.0)
    assert out["dof"] == 2


def test_rm_anova_matches_decomposition(spark):
    from gofast_spark.stats import rm_anova_test

    # 3 subjects x 2 conditions, additive effects + nothing else
    rows = [
        ("s1", "c1", 10.0), ("s1", "c2", 12.0),
        ("s2", "c1", 11.0), ("s2", "c2", 13.0),
        ("s3", "c1", 12.0), ("s3", "c2", 14.0),
    ]
    df = spark.createDataFrame(rows, ["s", "c", "v"])
    out = rm_anova_test(df, "s", "c", "v").collect()[0]
    # pure additive design -> zero error SS -> F unbounded; ss checks:
    assert out["ss_condition"] == pytest.approx(6.0)  # 2 cond, diff 2 -> n*1^2*...
    assert out["ss_subject"] == pytest.approx(4.0)
    assert out["ss_error"] == pytest.approx(0.0, abs=1e-9)
    assert out["dof_condition"] == 1
    assert out["dof_error"] == 2


def test_umbrella_dispatch(spark):
    from gofast_spark.stats import statistical_tests

    rows = [(2.0, 1.0), (3.0, 2.0), (4.0, 3.0), (9.0, 4.0)]
    df = spark.createDataFrame(rows, ["a", "b"])
    t = statistical_tests(df, "a", "b", test_type="ttest_paired").collect()[0]
    assert t["t_stat"] == pytest.approx(2.0)
    w = statistical_tests(df, "a", "b", test_type="wilcoxon").collect()[0]
    assert w["n_nonzero"] == 4
    with pytest.raises(ValueError):
        statistical_tests(df, "a", "b", test_type="nope")
