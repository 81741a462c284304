"""Unit tests for the round-11 model-evaluation additions: Acklam
inverse normal, AIC/BIC over the Cramer OLS fit, LOCO importance, the
Shapiro-Francia statistic, and the Hosmer-Lemeshow calibration test."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestNormalPpf:
    def test_known_quantiles(self, spark):
        from gofast_spark.stats.probs import normal_ppf

        # (p, Phi^{-1}(p)) reference values; Acklam |rel err| < 1.15e-9
        cases = [
            (0.5, 0.0),
            (0.975, 1.959963984540054),
            (0.025, -1.959963984540054),
            (0.841344746068543, 1.0),
            (0.001, -3.090232306167813),
            (0.999, 3.090232306167813),
        ]
        df = spark.createDataFrame([(p,) for p, _ in cases], "p double")
        out = {
            r["p"]: r["x"]
            for r in df.select("p", normal_ppf(F.col("p")).alias("x")).collect()
        }
        for p, expect in cases:
            assert out[p] == pytest.approx(expect, abs=5e-9)

    def test_roundtrip_with_cdf(self, spark):
        from gofast_spark.stats.probs import normal_cdf, normal_ppf

        ps = [0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99]
        df = spark.createDataFrame([(p,) for p in ps], "p double")
        out = df.select(
            "p", normal_cdf(normal_ppf(F.col("p"))).alias("back")
        ).collect()
        for r in out:
            # erf polynomial error (1.5e-7) dominates the roundtrip
            assert r["back"] == pytest.approx(r["p"], abs=5e-7)


class TestInformationCriteria:
    def test_matches_numpy_ols(self, spark):
        from gofast_spark.ml.regression import information_criteria

        rng = np.random.RandomState(2)
        x1 = rng.uniform(0, 10, 300)
        x2 = rng.uniform(0, 5, 300)
        y = 1.0 + 2.0 * x1 - 3.0 * x2 + rng.normal(0, 0.5, 300)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
            "x1 double, x2 double, y double",
        )
        row = information_criteria(df, ["x1", "x2"], "y").first()
        X = np.column_stack([np.ones(300), x1, x2])
        w, *_ = np.linalg.lstsq(X, y, rcond=None)
        sse = float(((y - X @ w) ** 2).sum())
        aic = 300 * math.log(sse / 300) + 2 * 3
        bic = 300 * math.log(sse / 300) + 3 * math.log(300)
        assert row["n"] == 300 and row["k_params"] == 3
        assert row["aic"] == pytest.approx(aic, abs=1e-3)
        assert row["bic"] == pytest.approx(bic, abs=1e-3)
        assert row["bic"] > row["aic"]  # ln(300) > 2


class TestLocoImportance:
    def test_informative_feature_dominates(self, spark):
        from gofast_spark.ml.regression import loco_importance

        rng = np.random.RandomState(4)
        x1 = rng.uniform(0, 10, 400)
        x2 = rng.uniform(0, 10, 400)
        y = 5.0 * x1 + 0.01 * x2 + rng.normal(0, 0.5, 400)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
            "x1 double, x2 double, y double",
        )
        rows = loco_importance(df, ["x1", "x2"], "y").collect()
        assert [r["feature"] for r in rows] == ["x1", "x2"]
        by = {r["feature"]: r for r in rows}
        # dropping the informative feature destroys the fit
        assert by["x1"]["delta_r2"] > 0.9
        assert by["x2"]["delta_r2"] < 0.01
        assert by["x1"]["r2_full"] == by["x2"]["r2_full"]
        # delta = full - reduced by construction
        for r in rows:
            assert r["delta_r2"] == pytest.approx(
                round(r["r2_full"] - r["r2_reduced"], 6), abs=2e-6
            )

    def test_two_features_required(self, spark):
        from gofast_spark.ml.regression import loco_importance

        df = spark.createDataFrame([(1.0, 2.0)], "x1 double, y double")
        with pytest.raises(ValueError, match="exactly 2"):
            loco_importance(df, ["x1"], "y")


class TestHosmerLemeshow:
    def test_perfectly_calibrated_probs(self, spark):
        from gofast_spark.stats.evaluation import hosmer_lemeshow

        # y drawn so each probability stratum's event rate equals p
        rows = []
        for p, k in [(0.2, 200), (0.5, 200), (0.8, 200)]:
            ones = int(p * k)
            rows += [(p, 1.0)] * ones + [(p, 0.0)] * (k - ones)
        df = spark.createDataFrame(rows, "p double, y double")
        out = hosmer_lemeshow(df, "p", "y", n_bins=10).first()
        assert out["n"] == 600
        # O_g == E_g exactly in every used bin -> chi2 == 0
        assert out["chi2_u6"] == 0
        assert out["dof"] == out["bins_used"] - 2

    def test_miscalibration_detected(self, spark):
        from gofast_spark.stats.evaluation import hosmer_lemeshow

        # claims 0.9 but events occur at 0.1, and vice versa
        rows = (
            [(0.9, 1.0)] * 20 + [(0.9, 0.0)] * 180
            + [(0.1, 1.0)] * 180 + [(0.1, 0.0)] * 20
        )
        df = spark.createDataFrame(rows, "p double, y double")
        out = hosmer_lemeshow(df, "p", "y", n_bins=10).first()
        assert out["chi2_u6"] / 1e6 > 100.0

    def test_empty_expected_bins_excluded(self, spark):
        from gofast_spark.stats.evaluation import hosmer_lemeshow

        # p == 0 rows make E_g = 0: the bin must be dropped, not NULL
        rows = [(0.0, 0.0)] * 50 + [(0.55, 1.0)] * 30 + [(0.55, 0.0)] * 30
        df = spark.createDataFrame(rows, "p double, y double")
        out = hosmer_lemeshow(df, "p", "y", n_bins=10).first()
        assert out["bins_used"] == 1
        assert out["n"] == 60


class TestShapiroFrancia:
    def test_normal_vs_exponential(self, spark):
        from gofast_spark.stats.distfit import shapiro_francia

        rng = np.random.RandomState(6)
        normal = rng.normal(50.0, 5.0, 500).round(2)
        expo = rng.exponential(10.0, 500).round(2)
        d1 = spark.createDataFrame([(float(v),) for v in normal], "v double")
        d2 = spark.createDataFrame([(float(v),) for v in expo], "v double")
        w1 = shapiro_francia(d1, "v").first()["w_prime"]
        w2 = shapiro_francia(d2, "v").first()["w_prime"]
        assert w1 > 0.99
        assert w2 < 0.9
        assert w1 > w2
