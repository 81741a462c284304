"""Probability column functions vs closed forms; model-comparison
utilities on a known score matrix."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_normal_pdf_cdf(spark):
    from gofast_spark.stats.probs import normal_cdf, normal_pdf

    df = spark.createDataFrame([(x / 2.0,) for x in range(-8, 9)], ["x"])
    out = df.select(
        "x",
        normal_pdf(F.col("x")).alias("pdf"),
        normal_cdf(F.col("x")).alias("cdf"),
    ).collect()
    for r in out:
        want_pdf = math.exp(-0.5 * r["x"] ** 2) / math.sqrt(2 * math.pi)
        want_cdf = 0.5 * (1 + math.erf(r["x"] / math.sqrt(2)))
        assert abs(r["pdf"] - want_pdf) < 1e-12
        assert abs(r["cdf"] - want_cdf) < 2e-7  # A&S 7.1.26 bound
    # symmetry
    cdfs = {r["x"]: r["cdf"] for r in out}
    assert abs(cdfs[2.0] + cdfs[-2.0] - 1.0) < 1e-7


def test_poisson_binomial_pmf(spark):
    from gofast_spark.stats.probs import binomial_pmf, poisson_logpmf

    df = spark.createDataFrame([(k,) for k in range(0, 12)], ["k"])
    out = df.select(
        "k",
        poisson_logpmf(F.col("k"), lam=3.0).alias("lp"),
        binomial_pmf(F.col("k"), n=10, p=0.3).alias("bp"),
    ).collect()
    for r in out:
        k = r["k"]
        want_lp = k * math.log(3.0) - 3.0 - math.lgamma(k + 1)
        assert abs(r["lp"] - want_lp) < 1e-9
        if k <= 10:
            want_bp = math.comb(10, k) * 0.3**k * 0.7 ** (10 - k)
            assert abs(r["bp"] - want_bp) < 1e-12
    # binomial pmf sums to 1 over support
    total = sum(r["bp"] for r in out if r["k"] <= 10)
    assert abs(total - 1.0) < 1e-9


def test_model_comparison_suite(spark):
    from gofast_spark.stats.comparisons import (
        compute_model_ranks,
        friedman_test_models,
        nemenyi_cd,
    )

    rows = []
    for fold in range(4):
        rows += [("good", fold, 0.9 + fold * 0.001),
                 ("mid", fold, 0.8),
                 ("bad", fold, 0.5)]
    df = spark.createDataFrame(rows, ["model", "fold", "score"])
    ranks = {r["model"]: r["avg_rank"] for r in compute_model_ranks(df).collect()}
    assert ranks["good"] == 1.0 and ranks["mid"] == 2.0 and ranks["bad"] == 3.0
    fr = friedman_test_models(df)
    assert fr["k_models"] == 3 and fr["n_folds"] == 4
    assert fr["statistic"] > 6.0  # perfectly consistent ranking -> max chi2
    cd = nemenyi_cd(3, 4)
    assert 1.0 < cd < 3.0


def test_twa_score_weights_recent_more(spark):
    from gofast_spark.metrics import twa_score

    # 4 steps: oldest 2 correct, newest 2 wrong
    rows = [(1, 1, 1), (2, 1, 1), (3, 1, 0), (4, 1, 0)]
    df = spark.createDataFrame(rows, ["t", "y", "yhat"])
    twa = twa_score(df, "y", "yhat", "t", alpha=0.5).collect()[0]["twa"]
    # weights (newest first): 1, .5, .25, .125 -> hits on .25+.125
    assert twa == pytest.approx(0.375 / 1.875)
    # alpha -> 1 approaches plain accuracy
    twa1 = twa_score(df, "y", "yhat", "t", alpha=0.999999).collect()[0]["twa"]
    assert twa1 == pytest.approx(0.5, abs=1e-4)


def test_dice_similarity_binary(spark):
    from gofast_spark.metrics import dice_similarity_score

    rows = [(1, 1), (1, 1), (1, 0), (0, 1), (0, 0)]
    df = spark.createDataFrame(rows, ["y", "yhat"])
    # TP=2, FN=1, FP=1 -> dice = 4/(4+1+1)
    d = dice_similarity_score(df, "y", "yhat").collect()[0]["dice"]
    assert d == pytest.approx(4 / 6)
