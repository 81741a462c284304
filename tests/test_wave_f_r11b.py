"""Unit tests for the Gehan-Wilcoxon weighted logrank, Theil-Sen
slope, D'Agostino K^2, and probit regression."""

from __future__ import annotations

import math

import numpy as np
import pytest


class TestWeightedLogrank:
    def _surv_df(self, spark):
        rng = np.random.RandomState(2)
        rows = []
        for i in range(300):
            grp = "a" if i % 2 == 0 else "b"
            scale = 5.0 if grp == "a" else 9.0
            dur = float(int(rng.exponential(scale)) + 1)
            ev = int(rng.uniform() < 0.8)
            rows.append((dur, ev, grp))
        return spark.createDataFrame(rows, "dur double, ev int, grp string")

    def test_gehan_detects_separation(self, spark):
        from gofast_spark.stats.survival import logrank_test

        df = self._surv_df(spark)
        out = logrank_test(
            df, "dur", "ev", "grp", "a", "b", weight="gehan"
        ).first()
        assert out["chi2"] > 6.0
        # group a dies earlier: observed-a exceeds expected early on
        assert out["o_minus_e"] > 0

    def test_default_weight_unchanged(self, spark):
        from gofast_spark.stats.survival import logrank_test

        df = self._surv_df(spark)
        plain = logrank_test(df, "dur", "ev", "grp", "a", "b").first()
        explicit = logrank_test(
            df, "dur", "ev", "grp", "a", "b", weight="logrank"
        ).first()
        assert plain == explicit

    def test_tarone_ware_between(self, spark):
        from gofast_spark.stats.survival import logrank_test

        df = self._surv_df(spark)
        by = {
            w: logrank_test(
                df, "dur", "ev", "grp", "a", "b", weight=w
            ).first()["var"]
            for w in ("logrank", "tarone_ware", "gehan")
        }
        # variances scale with the weight magnitude: 1 < sqrt(n) < n
        assert by["logrank"] < by["tarone_ware"] < by["gehan"]

    def test_unknown_weight_raises(self, spark):
        from gofast_spark.stats.survival import logrank_test

        df = self._surv_df(spark)
        with pytest.raises(ValueError, match="unknown logrank weight"):
            logrank_test(
                df, "dur", "ev", "grp", "a", "b", weight="peto"
            )


class TestTheilSen:
    def test_exact_line(self, spark):
        from gofast_spark.ts.longrun import theil_sen

        rows = [(i, i, 3.0 + 2.5 * i) for i in range(20)]
        df = spark.createDataFrame(rows, "o bigint, t bigint, v double")
        out = theil_sen(df, "o", "v", "t").first()
        assert out["n_pairs"] == 190
        assert out["slope"] == pytest.approx(2.5, abs=1e-9)
        assert out["intercept"] == pytest.approx(3.0, abs=1e-6)

    def test_outlier_resistant(self, spark):
        from gofast_spark.ts.longrun import theil_sen

        vals = [1.0 * i for i in range(30)]
        vals[5] = 1e6  # one wild outlier
        rows = [(i, i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "o bigint, t bigint, v double")
        out = theil_sen(df, "o", "v", "t").first()
        # OLS slope would be wrecked; the median slope stays ~1
        assert out["slope"] == pytest.approx(1.0, abs=0.05)


class TestDagostinoK2:
    def test_normal_sample_small_k2(self, spark):
        from gofast_spark.stats.distfit import dagostino_k2

        rng = np.random.RandomState(4)
        vals = rng.normal(0.0, 1.0, 1000)
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        out = dagostino_k2(df, "v").first()
        assert out["n"] == 1000
        # chi2(2) 99th percentile ~ 9.2
        assert out["k2"] < 9.2
        assert abs(out["g1"]) < 0.3
        assert abs(out["b2"] - 3.0) < 0.5

    def test_skewed_sample_rejected(self, spark):
        from gofast_spark.stats.distfit import dagostino_k2

        rng = np.random.RandomState(6)
        vals = rng.exponential(1.0, 1000)
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        out = dagostino_k2(df, "v").first()
        assert out["g1"] > 1.0
        assert out["z_skew"] > 5.0
        assert out["k2"] > 50.0


class TestProbitRegression:
    def test_recovers_known_coefficients(self, spark):
        from gofast_spark.ml.regression import fit_probit_regression
        from gofast_spark.stats.probs import normal_cdf  # noqa: F401

        rng = np.random.RandomState(8)
        n = 4000
        x = rng.uniform(-2, 2, n)
        z = -0.5 + 1.2 * x
        # Phi(z) via erf for the generator
        p = 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2.0)))
        y = (rng.uniform(size=n) < p).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        )
        m = fit_probit_regression(df, "x", "y", n_iter=5)
        assert m["n"] == n
        assert m["coef"][0] == pytest.approx(-0.5, abs=0.1)
        assert m["coef"][1] == pytest.approx(1.2, abs=0.12)

    def test_three_iterations_near_converged(self, spark):
        from gofast_spark.ml.regression import fit_probit_regression

        rng = np.random.RandomState(10)
        n = 1500
        x = rng.uniform(-1, 1, n)
        y = (rng.uniform(size=n) < 0.5 + 0.3 * x).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double",
        )
        w3 = fit_probit_regression(df, "x", "y", n_iter=3)["coef"]
        w6 = fit_probit_regression(df, "x", "y", n_iter=6)["coef"]
        assert w3[0] == pytest.approx(w6[0], abs=1e-4)
        assert w3[1] == pytest.approx(w6[1], abs=1e-4)
