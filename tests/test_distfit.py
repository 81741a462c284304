"""Unit tests for stats/distfit.py: closed-form distribution fits and
the Anderson-Darling statistic, checked against NumPy hand
computations on small frames."""

from __future__ import annotations

import math

import numpy as np
import pytest


def _df_from(spark, vals, extra_key=False):
    if extra_key:
        rows = [(i, 0, float(v)) for i, v in enumerate(vals)]
        return spark.createDataFrame(rows, "k1 bigint, k2 int, v double")
    return spark.createDataFrame([(float(v),) for v in vals], "v double")


class TestLognormalFit:
    def test_matches_numpy_mle(self, spark):
        from gofast_spark.stats.distfit import lognormal_fit

        rng = np.random.RandomState(7)
        vals = np.exp(rng.normal(2.0, 0.5, size=300))
        row = lognormal_fit(_df_from(spark, vals), "v").first()
        ln = np.log(vals)
        assert row["n"] == 300
        assert row["mu_ln"] == pytest.approx(ln.mean(), abs=1e-5)
        assert row["sigma_ln"] == pytest.approx(ln.std(), abs=1e-5)
        assert row["median_u6"] / 1e6 == pytest.approx(
            math.exp(ln.mean()), rel=1e-5
        )

    def test_ignores_nonpositive_and_null(self, spark):
        from gofast_spark.stats.distfit import lognormal_fit

        df = spark.createDataFrame(
            [(1.0,), (-5.0,), (0.0,), (None,), (math.e,)], "v double"
        )
        row = lognormal_fit(df, "v").first()
        assert row["n"] == 2
        assert row["mu_ln"] == pytest.approx(0.5, abs=1e-5)


class TestGammaMomFit:
    def test_matches_moment_equations(self, spark):
        from gofast_spark.stats.distfit import gamma_mom_fit

        rng = np.random.RandomState(11)
        vals = rng.gamma(3.0, 2.0, size=500)
        row = gamma_mom_fit(_df_from(spark, vals), "v").first()
        m, s2 = vals.mean(), vals.var(ddof=1)
        assert row["mean"] == pytest.approx(m, abs=1e-5)
        assert row["variance"] == pytest.approx(s2, abs=1e-3)
        assert row["shape"] == pytest.approx(m * m / s2, rel=1e-4)
        assert row["scale"] == pytest.approx(s2 / m, rel=1e-4)
        # sanity: recovers the generating parameters loosely
        assert 2.0 < row["shape"] < 4.5
        assert 1.3 < row["scale"] < 3.0


class TestParetoTailFit:
    def test_hill_on_exact_pareto(self, spark):
        from gofast_spark.stats.distfit import pareto_tail_fit

        # x = u^(-1/alpha) is exactly Pareto(alpha, 1) for u ~ U(0,1)
        rng = np.random.RandomState(3)
        alpha = 2.5
        vals = rng.uniform(size=2000) ** (-1.0 / alpha)
        df = _df_from(spark, vals, extra_key=True)
        row = pareto_tail_fit(df, "v", ["k1", "k2"], k=400).first()
        assert row["k"] == 400
        # Hill over the top 400 of an exact Pareto: se ~ alpha/sqrt(k)
        assert row["alpha"] == pytest.approx(alpha, abs=0.45)
        # threshold is the 401st order statistic from the top
        assert row["x_threshold"] == pytest.approx(
            np.sort(vals)[-401], rel=1e-9
        )

    def test_too_few_rows_raises(self, spark):
        from gofast_spark.stats.distfit import pareto_tail_fit

        df = _df_from(spark, [1.0, 2.0, 3.0], extra_key=True)
        with pytest.raises(ValueError, match="fewer than"):
            pareto_tail_fit(df, "v", ["k1", "k2"], k=10)


class TestAndersonDarling:
    def _a2_numpy(self, vals):
        x = np.sort(np.asarray(vals, dtype=float))
        n = len(x)
        mu, sd = x.mean(), x.std()
        z = (x - mu) / (sd * math.sqrt(2.0))
        # same Abramowitz-Stegun 7.1.26 polynomial as stats/probs
        a = (0.254829592, -0.284496736, 1.421413741, -1.453152027,
             1.061405429)
        t = 1.0 / (1.0 + 0.3275911 * np.abs(z))
        poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
        erf = 1.0 - poly * np.exp(-z * z)
        phi = np.where(z >= 0, 0.5 * (1 + erf), 1 - 0.5 * (1 + erf))
        phi = np.clip(phi, 1e-12, 1 - 1e-12)
        i = np.arange(1, n + 1)
        s = ((2 * i - 1) * np.log(phi)
             + (2 * (n - i) + 1) * np.log(1 - phi)).sum()
        return -n - s / n

    def test_matches_numpy_on_normal_sample(self, spark):
        from gofast_spark.stats.distfit import anderson_darling_normal

        rng = np.random.RandomState(5)
        vals = rng.normal(10.0, 2.0, size=400)
        row = anderson_darling_normal(_df_from(spark, vals), "v").first()
        assert row["n"] == 400
        expect = self._a2_numpy(vals)
        assert row["a2"] == pytest.approx(expect, abs=1e-3)
        # a normal sample should look normal: A2 well under ~1
        assert row["a2"] < 1.5

    def test_detects_gross_nonnormality(self, spark):
        from gofast_spark.stats.distfit import anderson_darling_normal

        rng = np.random.RandomState(9)
        vals = np.exp(rng.normal(0.0, 1.5, size=400))
        row = anderson_darling_normal(_df_from(spark, vals), "v").first()
        # heavily skewed log-normal: far above any normal critical value
        assert row["a2"] > 5.0

    def test_tie_invariance(self, spark):
        from gofast_spark.stats.distfit import anderson_darling_normal

        vals = [1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 4.0, 5.0] * 5
        a = anderson_darling_normal(_df_from(spark, vals), "v").first()
        b = anderson_darling_normal(
            _df_from(spark, list(reversed(vals))), "v"
        ).first()
        assert a["a2"] == b["a2"]
