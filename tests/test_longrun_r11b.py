"""Unit tests for ts/longrun.py: relational ADF, Cochrane-Orcutt, and
Hurst rescaled-range — directional behavior on synthetic series with
known dynamics."""

from __future__ import annotations

import numpy as np
import pytest


def _series_df(spark, vals):
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "t bigint, v double")


class TestAdfRelational:
    def test_stationary_series_rejects(self, spark):
        from gofast_spark.ts.longrun import adf_relational

        rng = np.random.RandomState(1)
        # strongly mean-reverting AR(1), phi = 0.2
        x = np.zeros(200)
        for i in range(1, 200):
            x[i] = 0.2 * x[i - 1] + rng.normal(0, 1)
        out = adf_relational(_series_df(spark, x + 100.0), "t", "v").first()
        assert out["n_obs"] == 198
        assert out["t_gamma"] < -5.0
        assert out["reject_5pct"] is True
        # gamma estimates phi - 1
        assert out["gamma"] == pytest.approx(-0.8, abs=0.2)

    def test_random_walk_does_not_reject(self, spark):
        from gofast_spark.ts.longrun import adf_relational

        rng = np.random.RandomState(3)
        x = np.cumsum(rng.normal(0, 1, 200)) + 1000.0
        out = adf_relational(_series_df(spark, x), "t", "v").first()
        assert out["t_gamma"] > -2.86
        assert out["reject_5pct"] is False

    def test_too_short_raises(self, spark):
        from gofast_spark.ts.longrun import adf_relational

        with pytest.raises(ValueError, match="at least"):
            adf_relational(_series_df(spark, [1.0, 2.0, 3.0]), "t", "v")


class TestCochraneOrcutt:
    def test_recovers_rho_and_slope(self, spark):
        from gofast_spark.ts.longrun import cochrane_orcutt

        rng = np.random.RandomState(5)
        n = 300
        u = np.zeros(n)
        for i in range(1, n):
            u[i] = 0.7 * u[i - 1] + rng.normal(0, 1)
        t = np.arange(n, dtype=float)
        y = 10.0 + 0.5 * t + u
        rows = [
            (int(i), float(i), float(v)) for i, v in zip(range(n), y)
        ]
        df = spark.createDataFrame(rows, "o bigint, t double, v double")
        out = cochrane_orcutt(df, "o", "v", "t").first()
        assert out["n"] == n
        assert out["rho"] == pytest.approx(0.7, abs=0.12)
        assert out["b_ols"] == pytest.approx(0.5, abs=0.05)
        assert out["b_co"] == pytest.approx(0.5, abs=0.05)

    def test_iid_errors_rho_near_zero(self, spark):
        from gofast_spark.ts.longrun import cochrane_orcutt

        rng = np.random.RandomState(7)
        n = 300
        t = np.arange(n, dtype=float)
        y = 5.0 + 1.0 * t + rng.normal(0, 1, n)
        rows = [
            (int(i), float(i), float(v)) for i, v in zip(range(n), y)
        ]
        df = spark.createDataFrame(rows, "o bigint, t double, v double")
        out = cochrane_orcutt(df, "o", "v", "t").first()
        assert abs(out["rho"]) < 0.15


class TestHurstRs:
    def test_iid_near_half(self, spark):
        from gofast_spark.ts.longrun import hurst_rs

        rng = np.random.RandomState(9)
        x = rng.normal(100.0, 5.0, 600)
        out = hurst_rs(
            _series_df(spark, x), "t", "v", block_sizes=(10, 20, 40)
        ).collect()
        assert [r["m"] for r in out] == [10, 20, 40]
        h = out[0]["hurst"]
        assert all(r["hurst"] == h for r in out)
        # iid increments: H in the white-noise band (R/S small-sample
        # bias keeps it slightly above 0.5)
        assert 0.35 < h < 0.75

    def test_persistent_series_higher_h(self, spark):
        from gofast_spark.ts.longrun import hurst_rs

        rng = np.random.RandomState(11)
        # a random walk (integrated series) is maximally persistent
        walk = np.cumsum(rng.normal(0, 1, 600)) + 500.0
        iid = rng.normal(500.0, 1.0, 600)
        h_walk = hurst_rs(
            _series_df(spark, walk), "t", "v",
            block_sizes=(10, 20, 40),
        ).first()["hurst"]
        h_iid = hurst_rs(
            _series_df(spark, iid), "t", "v",
            block_sizes=(10, 20, 40),
        ).first()["hurst"]
        assert h_walk > h_iid
        assert h_walk > 0.75

    def test_needs_two_sizes(self, spark):
        from gofast_spark.ts.longrun import hurst_rs

        x = [float(i % 7) for i in range(30)]
        with pytest.raises(ValueError, match=">= 2 block sizes"):
            hurst_rs(
                _series_df(spark, x), "t", "v", block_sizes=(50,)
            )
