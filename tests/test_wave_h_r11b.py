"""Unit tests for per-group Wasserstein, cross-correlation, the
Spiegelhalter calibration Z, and the Lepage location-scale test."""

from __future__ import annotations

import numpy as np
import pytest


class TestWassersteinByGroup:
    def test_shifted_group_largest(self, spark):
        from gofast_spark.quality.drift import wasserstein_by_group

        rng = np.random.RandomState(1)
        rows = (
            [("a", float(v)) for v in rng.normal(0, 1, 150)]
            + [("b", float(v)) for v in rng.normal(0, 1, 150)]
            + [("c", float(v)) for v in rng.normal(6, 1, 150)]
        )
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["g"]: r for r in wasserstein_by_group(df, "v", "g").collect()}
        assert set(out) == {"a", "b", "c"}
        assert out["c"]["w1_u9"] > out["a"]["w1_u9"]
        assert out["c"]["w1_u9"] > out["b"]["w1_u9"]
        # c vs pooled(a, b): the shift is ~6
        assert out["c"]["w1_u9"] / 1e9 == pytest.approx(6.0, abs=0.5)

    def test_two_group_case_matches_pairwise(self, spark):
        from gofast_spark.quality.drift import (
            wasserstein_1d,
            wasserstein_by_group,
        )

        rng = np.random.RandomState(3)
        rows = [("a", float(v)) for v in rng.uniform(0, 5, 100)] + [
            ("b", float(v)) for v in rng.uniform(2, 9, 100)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        pair = wasserstein_1d(df, "v", "g", "a", "b").first()["w1_u9"]
        by = {r["g"]: r["w1_u9"] for r in wasserstein_by_group(df, "v", "g").collect()}
        # leave-one-out of k=2 is exactly the pairwise distance
        assert by["a"] == pair
        assert by["b"] == pair


class TestCrossCorrelation:
    def test_known_lag_recovered(self, spark):
        from gofast_spark.ts.causality import cross_correlation

        import datetime

        rng = np.random.RandomState(5)
        base = rng.poisson(50, 60).astype(int)
        d0 = datetime.date(2024, 1, 1)
        x_rows = [
            (d0 + datetime.timedelta(days=i), int(v))
            for i, v in enumerate(base)
        ]
        # y tracks x two days later plus noise
        y_rows = [
            (
                d0 + datetime.timedelta(days=i + 2),
                int(v + rng.poisson(3)),
            )
            for i, v in enumerate(base)
        ]
        x = spark.createDataFrame(x_rows, "d date, v bigint")
        y = spark.createDataFrame(y_rows, "d date, v bigint")
        out = {r["lag"]: r["r"] for r in cross_correlation(x, y, "d", "v", max_lag=3).collect()}
        assert len(out) == 7
        assert out[2] > 0.9
        assert out[2] > max(v for k, v in out.items() if k != 2)


class TestSpiegelhalterZ:
    def test_calibrated_near_zero(self, spark):
        from gofast_spark.stats.evaluation import spiegelhalter_z

        rng = np.random.RandomState(7)
        rows = []
        for _ in range(3000):
            p = float(rng.uniform(0.1, 0.9))
            rows.append((p, float(rng.uniform() < p)))
        df = spark.createDataFrame(rows, "p double, y double")
        out = spiegelhalter_z(df, "p", "y").first()
        assert out["n"] == 3000
        assert abs(out["z"]) < 3.0

    def test_overconfident_scores_flagged(self, spark):
        from gofast_spark.stats.evaluation import spiegelhalter_z

        rng = np.random.RandomState(9)
        # claims 0.95/0.05 but the truth is 0.7/0.3
        rows = []
        for _ in range(2000):
            if rng.uniform() < 0.5:
                rows.append((0.95, float(rng.uniform() < 0.7)))
            else:
                rows.append((0.05, float(rng.uniform() < 0.3)))
        df = spark.createDataFrame(rows, "p double, y double")
        out = spiegelhalter_z(df, "p", "y").first()
        assert abs(out["z"]) > 5.0


class TestLepage:
    def test_location_shift_detected(self, spark):
        from gofast_spark.stats.inferential import lepage_test

        rng = np.random.RandomState(11)
        rows = [("a", float(v)) for v in rng.normal(0, 1, 200)] + [
            ("b", float(v)) for v in rng.normal(2, 1, 200)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = lepage_test(df, "v", "g", "a", "b").first()
        assert abs(out["z_wilcoxon"]) > 5.0
        assert out["d_stat"] > 30.0

    def test_scale_only_shift_detected_by_ansari_part(self, spark):
        from gofast_spark.stats.inferential import lepage_test

        rng = np.random.RandomState(13)
        rows = [("a", float(v)) for v in rng.normal(0, 1, 200)] + [
            ("b", float(v)) for v in rng.normal(0, 4, 200)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = lepage_test(df, "v", "g", "a", "b").first()
        assert abs(out["z_wilcoxon"]) < 3.0
        assert abs(out["z_ansari"]) > 4.0
        # d_stat squares the UNROUNDED z's; the reported z's are
        # round-6, so the identity holds only approximately
        assert out["d_stat"] == pytest.approx(
            out["z_wilcoxon"] ** 2 + out["z_ansari"] ** 2, abs=1e-4
        )

    def test_null_small_d(self, spark):
        from gofast_spark.stats.inferential import lepage_test

        rng = np.random.RandomState(15)
        rows = [("a", float(v)) for v in rng.normal(0, 1, 200)] + [
            ("b", float(v)) for v in rng.normal(0, 1, 200)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = lepage_test(df, "v", "g", "a", "b").first()
        # chi2(2) 99.9th percentile ~ 13.8
        assert out["d_stat"] < 13.8
