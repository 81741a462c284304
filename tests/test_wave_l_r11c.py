"""Unit tests for the round-11 third-wave batch K5: Lin's CCC,
Bland-Altman, Hill numbers, seasonal Mann-Kendall, Dixon's Q, and the
Bowley/Moors robust moments."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestLinCCC:
    def test_perfect_agreement_is_one(self, spark):
        from gofast_spark.stats.evaluation import lin_ccc

        rows = [(float(i), float(i)) for i in range(1, 30)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = lin_ccc(df, "a", "b", quantize=1).first()
        assert out["ccc"] == pytest.approx(1.0, abs=1e-12)
        assert out["r_pearson"] == pytest.approx(1.0, abs=1e-12)

    def test_shift_penalizes_ccc_not_r(self, spark):
        from gofast_spark.stats.evaluation import lin_ccc

        rows = [(float(i), float(i) + 10.0) for i in range(1, 30)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = lin_ccc(df, "a", "b", quantize=1).first()
        assert out["r_pearson"] == pytest.approx(1.0, abs=1e-12)
        # var(1..29) = 70; shift^2 = 100 -> ccc = 140/240
        assert out["ccc"] == pytest.approx(140.0 / 240.0, rel=1e-9)
        assert out["ccc"] < out["r_pearson"]

    def test_matches_population_formula(self, spark):
        from gofast_spark.stats.evaluation import lin_ccc

        rng = np.random.RandomState(41)
        a = np.round(rng.normal(10, 2, 200), 2)
        b = np.round(a + rng.normal(0.5, 1, 200), 2)
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in zip(a, b)],
            "a double, b double",
        )
        out = lin_ccc(df, "a", "b").first()
        sxy = np.cov(a, b, bias=True)[0, 1]
        ref = 2 * sxy / (a.var() + b.var() + (a.mean() - b.mean()) ** 2)
        assert out["ccc"] == pytest.approx(ref, rel=1e-9)


class TestBlandAltman:
    def test_known_bias_and_limits(self, spark):
        from gofast_spark.stats.evaluation import bland_altman

        rng = np.random.RandomState(43)
        a = np.round(rng.normal(100, 10, 500), 3)
        b = np.round(a - 2.0 + rng.normal(0, 0.5, 500), 3)
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in zip(a, b)],
            "a double, b double",
        )
        out = bland_altman(df, "a", "b").first()
        d = np.round(a * 1e6 + 0.5).astype(np.int64) // 1 - 0  # noqa: F841
        diffs = np.floor(a * 1e6 + 0.5) - np.floor(b * 1e6 + 0.5)
        ref_mean = diffs.mean() / 1e6
        ref_sd = diffs.std(ddof=1) / 1e6
        assert out["mean_diff"] == pytest.approx(ref_mean, rel=1e-9)
        assert out["sd_diff"] == pytest.approx(ref_sd, rel=1e-9)
        assert out["loa_lo"] == pytest.approx(
            ref_mean - 1.959964 * ref_sd, rel=1e-9
        )
        assert out["loa_hi"] == pytest.approx(
            ref_mean + 1.959964 * ref_sd, rel=1e-9
        )


class TestHillNumbers:
    def test_uniform_distribution_all_equal(self, spark):
        from gofast_spark.text.analysis import hill_numbers

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id bigint, text string"
        )
        out = hill_numbers(df, "text").first()
        assert out["hill_0"] == 4
        assert out["hill_1"] == pytest.approx(4.0, abs=1e-4)
        assert out["hill_2"] == pytest.approx(4.0, abs=1e-9)

    def test_ordering_n0_ge_n1_ge_n2(self, spark):
        from gofast_spark.text.analysis import hill_numbers

        df = spark.createDataFrame(
            [(1, "the the the the cat sat on a mat")],
            "doc_id bigint, text string",
        )
        out = hill_numbers(df, "text").first()
        assert out["hill_0"] >= out["hill_1"] >= out["hill_2"]
        # skewed head: effective numbers strictly below richness
        assert out["hill_1"] < out["hill_0"]


class TestSeasonalMannKendall:
    def test_within_season_trend_detected(self, spark):
        from gofast_spark.ts.engineering import seasonal_mann_kendall

        # strong weekly cycle + slow upward trend
        rows = [
            (i, float((i % 7) * 100 + i * 0.5), i % 7) for i in range(56)
        ]
        df = spark.createDataFrame(rows, "t bigint, v double, s bigint")
        out = seasonal_mann_kendall(df, "t", "v", "s").first()
        # every within-season pair increases: S = 7 * C(8,2) = 196
        assert out["s"] == 196
        assert out["z"] > 4.0
        assert out["n_seasons"] == 7

    def test_pure_cycle_no_trend(self, spark):
        from gofast_spark.ts.engineering import seasonal_mann_kendall

        rows = [(i, float(i % 7), i % 7) for i in range(56)]
        df = spark.createDataFrame(rows, "t bigint, v double, s bigint")
        out = seasonal_mann_kendall(df, "t", "v", "s").first()
        # constant within every season: S = 0, z = 0
        assert out["s"] == 0
        assert out["z"] == 0.0


class TestDixonQ:
    def test_hand_computed_ratios(self, spark):
        from gofast_spark.ts.engineering import dixon_q

        vals = [10.0, 11.0, 12.0, 13.0, 30.0]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "t bigint, v double"
        )
        out = dixon_q(df, "v").first()
        assert out["x_min"] == 10.0 and out["x_max"] == 30.0
        assert out["q_low"] == pytest.approx(1.0 / 20.0, abs=1e-9)
        assert out["q_high"] == pytest.approx(17.0 / 20.0, abs=1e-9)

    def test_constant_series_null_ratios(self, spark):
        from gofast_spark.ts.engineering import dixon_q

        df = spark.createDataFrame(
            [(i, 5.0) for i in range(6)], "t bigint, v double"
        )
        out = dixon_q(df, "v").first()
        assert out["q_low"] is None and out["q_high"] is None


class TestRobustMoments:
    def test_symmetric_sample_zero_bowley(self, spark):
        from gofast_spark.stats.descriptive import robust_quantile_moments

        vals = [float(v) for v in range(-40, 41)]  # symmetric 81 values
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = robust_quantile_moments(df, "v").first()
        assert out["bowley_skew"] == pytest.approx(0.0, abs=1e-9)
        assert out["median"] == pytest.approx(0.0, abs=1e-9)

    def test_octile_selection_matches_numpy_lower(self, spark):
        from gofast_spark.stats.descriptive import robust_quantile_moments

        rng = np.random.RandomState(47)
        x = np.round(rng.normal(0, 1, 2000), 2)
        df = spark.createDataFrame([(float(v),) for v in x], "v double")
        out = robust_quantile_moments(df, "v").first()
        xs = np.sort(np.floor(x * 100 + 0.5).astype(np.int64))
        n = len(xs)

        def oct_(i):
            return xs[math.ceil(i * n / 8) - 1] / 100.0

        assert out["q1"] == pytest.approx(oct_(2), abs=1e-12)
        assert out["median"] == pytest.approx(oct_(4), abs=1e-12)
        assert out["q3"] == pytest.approx(oct_(6), abs=1e-12)
        e = {i: oct_(i) for i in range(1, 8)}
        assert out["moors_kurtosis"] == pytest.approx(
            ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2]), rel=1e-9
        )
        # Moors' normal reference is ~1.233
        assert 1.0 < out["moors_kurtosis"] < 1.5

    def test_right_skew_positive_bowley(self, spark):
        from gofast_spark.stats.descriptive import robust_quantile_moments

        rng = np.random.RandomState(53)
        x = np.round(np.exp(rng.normal(0, 0.8, 3000)), 3)
        df = spark.createDataFrame([(float(v),) for v in x], "v double")
        out = robust_quantile_moments(df, "v", quantize=1000).first()
        assert out["bowley_skew"] > 0.1


class TestHoltForecast:
    @staticmethod
    def _ref(y, horizons=7):
        # integer dyadic recursion, alpha=1/2 beta=1/4
        yq = [int(np.floor(v * 10000 + 0.5)) for v in y]
        l, b = yq[1], yq[1] - yq[0]
        for v in yq[2:]:
            l_new = (v + (l + b)) // 2
            b = ((l_new - l) + 3 * b) // 4
            l = l_new
        return [(h, (l + h * b) / 10000.0) for h in range(1, horizons + 1)]

    def test_matches_pure_python_recursion(self, spark):
        from gofast_spark.ts.engineering import holt_forecast

        rng = np.random.RandomState(59)
        y = np.round(10 + 0.5 * np.arange(30) + rng.normal(0, 1, 30), 4)
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(y)], "t bigint, v double"
        )
        out = {
            r["h"]: r["forecast"]
            for r in holt_forecast(df, "v", "t").collect()
        }
        for h, f in self._ref(y):
            assert out[h] == pytest.approx(f, abs=1e-12)

    def test_linear_series_extrapolates_linearly(self, spark):
        from gofast_spark.ts.engineering import holt_forecast

        df = spark.createDataFrame(
            [(i, 2.0 * i + 5.0) for i in range(20)], "t bigint, v double"
        )
        rows = {r["h"]: r for r in holt_forecast(df, "v", "t").collect()}
        # exact linear input: trend converges to ~2/step
        assert rows[1]["trend"] == pytest.approx(2.0, abs=0.1)
        assert rows[7]["forecast"] - rows[1]["forecast"] == pytest.approx(
            12.0, abs=0.6
        )


class TestCMH:
    def test_confounded_marginal_adjusted_away(self, spark):
        from gofast_spark.stats.inferential import cochran_mantel_haenszel

        # two strata; within each stratum exposure and outcome are
        # INDEPENDENT, but both are stratum-correlated, faking a
        # marginal association: CMH must stay small.
        rows = []
        # stratum s1: exposure 80%, outcome 80%
        for e in (1, 0):
            for o in (1, 0):
                pe = 0.8 if e else 0.2
                po = 0.8 if o else 0.2
                rows += [("s1", e, o)] * int(100 * pe * po)
        # stratum s2: exposure 20%, outcome 20%
        for e in (1, 0):
            for o in (1, 0):
                pe = 0.2 if e else 0.8
                po = 0.2 if o else 0.8
                rows += [("s2", e, o)] * int(100 * pe * po)
        df = spark.createDataFrame(rows, "k string, e int, o int")
        out = cochran_mantel_haenszel(
            df, "k", F.col("e") == 1, F.col("o") == 1
        ).first()
        assert out["cmh_stat"] < 1.0
        assert out["or_mh"] == pytest.approx(1.0, abs=0.05)
        assert out["n_strata"] == 2

    def test_real_association_detected(self, spark):
        from gofast_spark.stats.inferential import cochran_mantel_haenszel

        rows = []
        for k in ("s1", "s2"):
            rows += [(k, 1, 1)] * 60 + [(k, 1, 0)] * 40
            rows += [(k, 0, 1)] * 30 + [(k, 0, 0)] * 70
        df = spark.createDataFrame(rows, "k string, e int, o int")
        out = cochran_mantel_haenszel(
            df, "k", F.col("e") == 1, F.col("o") == 1
        ).first()
        # per-stratum OR = (60*70)/(40*30) = 3.5
        assert out["or_mh"] == pytest.approx(3.5, abs=0.01)
        assert out["cmh_stat"] > 15.0


class TestGroupedVariants:
    def test_lexical_richness_by_group_matches_pooled_per_slice(self, spark):
        from gofast_spark.text.analysis import (
            lexical_richness,
            lexical_richness_by_group,
        )

        rows = [
            (1, "en", "the cat sat on the mat"),
            (2, "en", "the cat ran"),
            (3, "fr", "le chat le chat noir"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        )
        grouped = {
            r["lang"]: r
            for r in lexical_richness_by_group(df, "text", "lang").collect()
        }
        for lang in ("en", "fr"):
            pooled = lexical_richness(
                df.where(F.col("lang") == lang), "text"
            ).first()
            g = grouped[lang]
            assert g["n_tokens"] == pooled["n_tokens"]
            assert g["yule_k"] == pytest.approx(pooled["yule_k"], abs=1e-12)

    def test_wilson_by_group_matches_pooled_per_slice(self, spark):
        from gofast_spark.stats.inferential import (
            wilson_interval,
            wilson_interval_by_group,
        )

        rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 3 + [
            ("b", 0)
        ] * 7
        df = spark.createDataFrame(rows, "g string, y int")
        grouped = {
            r["g"]: r
            for r in wilson_interval_by_group(
                df, "g", F.col("y") == 1
            ).collect()
        }
        for g in ("a", "b"):
            pooled = wilson_interval(
                df.where(F.col("g") == g), F.col("y") == 1
            ).first()
            assert grouped[g]["wilson_lo"] == pytest.approx(
                pooled["wilson_lo"], abs=1e-12
            )
            assert grouped[g]["wilson_hi"] == pytest.approx(
                pooled["wilson_hi"], abs=1e-12
            )

    def test_von_neumann_by_group_short_series_null(self, spark):
        from gofast_spark.ts.engineering import von_neumann_by_group

        rows = [("a", 0, 1.0), ("a", 1, 2.0), ("b", 0, 1.0),
                ("b", 1, 3.0), ("b", 2, 2.0), ("b", 3, 5.0)]
        df = spark.createDataFrame(rows, "g string, t bigint, v double")
        out = {
            r["g"]: r
            for r in von_neumann_by_group(df, "v", "t", "g").collect()
        }
        assert out["a"]["vn_ratio"] is None  # n = 2 guard
        assert out["b"]["vn_ratio"] is not None


class TestBreslowDay:
    def test_homogeneous_strata_small_stat(self, spark):
        from gofast_spark.stats.inferential import breslow_day

        rows = []
        for k in ("s1", "s2", "s3"):
            rows += [(k, 1, 1)] * 60 + [(k, 1, 0)] * 40
            rows += [(k, 0, 1)] * 30 + [(k, 0, 0)] * 70
        df = spark.createDataFrame(rows, "k string, e int, o int")
        out = breslow_day(
            df, "k", F.col("e") == 1, F.col("o") == 1
        ).first()
        # identical per-stratum tables: OR homogeneous, BD ~ 0
        assert out["bd_stat"] == pytest.approx(0.0, abs=1e-3)
        assert out["dof"] == 2
        assert out["psi_mh"] == pytest.approx(3.5, abs=0.01)

    def test_heterogeneous_strata_large_stat(self, spark):
        from gofast_spark.stats.inferential import breslow_day

        rows = []
        # stratum 1: OR = 9; stratum 2: OR = 1/9
        rows += [("s1", 1, 1)] * 90 + [("s1", 1, 0)] * 10
        rows += [("s1", 0, 1)] * 50 + [("s1", 0, 0)] * 50
        rows += [("s2", 1, 1)] * 10 + [("s2", 1, 0)] * 90
        rows += [("s2", 0, 1)] * 50 + [("s2", 0, 0)] * 50
        df = spark.createDataFrame(rows, "k string, e int, o int")
        out = breslow_day(
            df, "k", F.col("e") == 1, F.col("o") == 1
        ).first()
        assert out["bd_stat"] > 20.0
        assert out["dof"] == 1


class TestVocabCoverage:
    def test_hand_computed_coverage(self, spark):
        from gofast_spark.text.analysis import vocab_topk_coverage

        # counts: the=5, cat=3, sat=1, mat=1 -> N=10
        rows = [(1, "the the the cat cat sat"), (2, "the the cat mat")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = vocab_topk_coverage(df, "text", ks=(1, 2, 3)).first()
        assert out["n_tokens"] == 10 and out["n_types"] == 4
        assert out["cov_1"] == pytest.approx(0.5, abs=1e-12)
        assert out["cov_2"] == pytest.approx(0.8, abs=1e-12)
        assert out["cov_3"] == pytest.approx(0.9, abs=1e-12)

    def test_tie_break_is_alphabetical(self, spark):
        from gofast_spark.text.analysis import vocab_topk_coverage

        # apple and zebra both occur twice; top-1 must pick 'apple'
        rows = [(1, "apple zebra apple zebra kiwi")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = vocab_topk_coverage(df, "text", ks=(1,)).first()
        assert out["cov_1"] == pytest.approx(0.4, abs=1e-12)


class TestLastDigitUniformity:
    def test_uniform_digits_small_chi2(self, spark):
        from gofast_spark.quality.audit import last_digit_uniformity

        rows = [(float(i) / 100.0,) for i in range(1000)]
        df = spark.createDataFrame(rows, "v double")
        out = last_digit_uniformity(df, "v").first()
        # perfectly uniform last digits: chi2 exactly 0
        assert out["chi2"] == 0.0
        assert out["digits_seen"] == 10
        assert out["dof"] == 9

    def test_rounded_amounts_flagged(self, spark):
        from gofast_spark.quality.audit import last_digit_uniformity

        # every amount ends in .x0 cents: massive chi2
        rows = [(float(i) / 10.0,) for i in range(500)]
        df = spark.createDataFrame(rows, "v double")
        out = last_digit_uniformity(df, "v").first()
        # all mass on digit 0: chi2 = (10*n^2 - n^2)/n = 9n
        assert out["chi2"] == pytest.approx(9 * 500, abs=1e-9)


class TestCumPeriodogram:
    def test_pure_sine_concentrates(self, spark):
        from gofast_spark.ts.engineering import cum_periodogram_test

        import math

        rows = [
            (i, 100.0 + 50.0 * math.sin(2 * math.pi * 3 * i / 60))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = cum_periodogram_test(df, "t", "v").first()
        # all spectral mass near one harmonic: large sup gap
        assert out["d_stat"] > 0.4
        assert out["m"] == 10

    def test_white_noise_small_gap(self, spark):
        from gofast_spark.ts.engineering import cum_periodogram_test

        rng = np.random.RandomState(61)
        rows = [(i, float(v)) for i, v in enumerate(rng.normal(0, 1, 200))]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = cum_periodogram_test(df, "t", "v").first()
        assert out["d_stat"] < 0.35


class TestCvMTwoSample:
    def test_identical_samples_zero(self, spark):
        from gofast_spark.stats.inferential import cvm_two_sample

        vals = [1.0, 2.0, 3.0, 4.0, 5.0]
        rows = [("a", v) for v in vals] + [("b", v) for v in vals]
        df = spark.createDataFrame(rows, "g string, v double")
        out = cvm_two_sample(df, "v", "g", "a", "b").first()
        assert out["t_cvm"] == 0.0

    def test_matches_direct_ecdf_sum(self, spark):
        from gofast_spark.stats.inferential import cvm_two_sample

        rng = np.random.RandomState(67)
        a = np.round(rng.normal(0, 1, 70), 3)
        b = np.round(rng.normal(0.5, 1.3, 90), 3)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        out = cvm_two_sample(df, "v", "g", "a", "b").first()
        pooled = np.sort(np.concatenate([a, b]))
        fa = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
        n, m = len(a), len(b)
        ref = n * m / (n + m) ** 2 * np.sum((fa - fb) ** 2)
        assert out["t_cvm"] == pytest.approx(ref, rel=1e-9)


class TestAncova:
    def test_adjusts_covariate_driven_difference_away(self, spark):
        from gofast_spark.stats.inferential import ancova_oneway

        # y depends ONLY on x; group b just has larger x, so raw
        # means differ but the adjusted effect must vanish
        rng = np.random.RandomState(71)
        rows = []
        for i in range(200):
            x = float(i % 50)
            rows.append(("a", 2.0 * x + float(np.round(rng.normal(0, 0.5), 3)), x))
        for i in range(200):
            x = float(50 + i % 50)
            rows.append(("b", 2.0 * x + float(np.round(rng.normal(0, 0.5), 3)), x))
        df = spark.createDataFrame(rows, "g string, y double, x double")
        out = ancova_oneway(df, "y", "x", "g").first()
        assert out["slope_within"] == pytest.approx(2.0, abs=0.05)
        # chi2/F threshold: adjusted group effect indistinguishable
        assert out["f_stat"] < 4.0

    def test_real_group_effect_survives_adjustment(self, spark):
        from gofast_spark.stats.inferential import ancova_oneway

        rng = np.random.RandomState(73)
        rows = []
        for i in range(150):
            x = float(i % 50)
            rows.append(("a", x + float(np.round(rng.normal(0, 0.5), 3)), x))
            rows.append(("b", x + 5.0 + float(np.round(rng.normal(0, 0.5), 3)), x))
        df = spark.createDataFrame(rows, "g string, y double, x double")
        out = ancova_oneway(df, "y", "x", "g").first()
        assert out["f_stat"] > 100.0
        assert out["dof_between"] == 1


class TestTokenizerFertility:
    def test_punctuation_raises_fertility(self, spark):
        from gofast_spark.text.analysis import tokenizer_fertility_by_group

        rows = [
            (1, "en", "plain words here"),
            (2, "xx", "hy-phen-ated, punc!tu@ted; text."),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, lang string, text string"
        )
        out = {
            r["lang"]: r
            for r in tokenizer_fertility_by_group(df, "text", "lang").collect()
        }
        assert out["en"]["fertility"] == pytest.approx(1.0, abs=1e-12)
        assert out["xx"]["fertility"] >= 2.0


class TestExpectedCalibrationError:
    def test_perfectly_calibrated_near_zero(self, spark):
        from gofast_spark.metrics import expected_calibration_error

        rng = np.random.RandomState(79)
        s = rng.rand(20000)
        y = (rng.rand(20000) < s).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(s, y)],
            "score double, label int",
        )
        out = expected_calibration_error(df, "score", "label").first()
        assert out["ece"] < 0.03
        assert out["n_bins"] == 10

    def test_anti_calibrated_large(self, spark):
        from gofast_spark.metrics import expected_calibration_error

        rng = np.random.RandomState(83)
        s = rng.rand(5000)
        y = (rng.rand(5000) < (1 - s)).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(s, y)],
            "score double, label int",
        )
        out = expected_calibration_error(df, "score", "label").first()
        assert out["ece"] > 0.3
        assert out["mce"] >= out["ece"]

    def test_hand_computed_two_bins(self, spark):
        from gofast_spark.metrics import expected_calibration_error

        # bin0: scores 0.1 x4, 1 positive (acc .25, conf .1)
        # bin1 (scores>=.5): scores 0.9 x4, all positive (acc 1, conf .9)
        rows = [(0.1, 1), (0.1, 0), (0.1, 0), (0.1, 0)] + [
            (0.9, 1)
        ] * 4
        df = spark.createDataFrame(rows, "score double, label int")
        out = expected_calibration_error(df, "score", "label", bins=2).first()
        # ece = (4/8)*.15 + (4/8)*.1 = 0.125
        assert out["ece"] == pytest.approx(0.125, abs=1e-9)
        assert out["mce"] == pytest.approx(0.15, abs=1e-9)


class TestOutlierConsensus:
    def test_gross_outlier_flagged_by_all(self, spark):
        from gofast_spark.quality.audit import outlier_consensus

        rng = np.random.RandomState(89)
        vals = list(np.round(rng.normal(10, 1, 500), 3)) + [1000.0]
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        out = outlier_consensus(df, "v").first()
        assert out["n"] == 501
        assert out["n_consensus3"] >= 1
        assert out["n_z"] >= 1 and out["n_iqr"] >= 1 and out["n_mad"] >= 1

    def test_clean_normal_few_consensus(self, spark):
        from gofast_spark.quality.audit import outlier_consensus

        rng = np.random.RandomState(97)
        vals = np.round(rng.normal(0, 1, 2000), 3)
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        out = outlier_consensus(df, "v").first()
        # z>3 two-sided on N(0,1): ~0.27%; consensus should stay tiny
        assert out["n_consensus2"] < 40


class TestDesignEffect:
    def test_homogeneous_strata_help(self, spark):
        from gofast_spark.stats.descriptive import design_effect_stratified

        rng = np.random.RandomState(101)
        rows = []
        for h, mu in (("a", 0.0), ("b", 50.0), ("c", 100.0)):
            for v in rng.normal(mu, 1, 300):
                rows.append((h, float(np.round(v, 2))))
        df = spark.createDataFrame(rows, "h string, v double")
        out = design_effect_stratified(df, "v", "h").first()
        # between-strata spread dominates: stratification crushes var
        assert out["deff_prop"] < 0.05
        assert out["deff_neyman"] <= out["deff_prop"] + 1e-9
        assert out["n_strata"] == 3

    def test_useless_strata_deff_near_one(self, spark):
        from gofast_spark.stats.descriptive import design_effect_stratified

        rng = np.random.RandomState(103)
        rows = [
            (str(rng.randint(3)), float(np.round(v, 2)))
            for v in rng.normal(10, 5, 900)
        ]
        df = spark.createDataFrame(rows, "h string, v double")
        out = design_effect_stratified(df, "v", "h").first()
        assert out["deff_prop"] == pytest.approx(1.0, abs=0.05)


class TestRecordCounts:
    def test_monotone_series_every_point_a_record(self, spark):
        from gofast_spark.ts.engineering import record_counts

        rows = [(i, float(i)) for i in range(25)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = record_counts(df, "v", "t").first()
        assert out["n_record_high"] == 25
        assert out["n_record_low"] == 1
        h25 = sum(1.0 / k for k in range(1, 26))
        assert out["expected"] == pytest.approx(h25, abs=1e-6)

    def test_ties_do_not_set_records(self, spark):
        from gofast_spark.ts.engineering import record_counts

        rows = [(0, 5.0), (1, 5.0), (2, 5.0)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = record_counts(df, "v", "t").first()
        assert out["n_record_high"] == 1
        assert out["n_record_low"] == 1


class TestBernoulliCusum:
    def test_in_control_stays_low_shift_alarms(self, spark):
        from gofast_spark.ts.changepoint import bernoulli_cusum

        rng = np.random.RandomState(107)
        rows = []
        for t in range(40):
            n = 200
            p = 0.2 if t < 20 else 0.35
            k = int(rng.binomial(n, p))
            rows.append((t, k, n))
        df = spark.createDataFrame(rows, "t bigint, k bigint, n bigint")
        out = bernoulli_cusum(df, "t", "k", "n").collect()
        by_t = {r["t"]: r for r in out}
        # in-control first half: no alarm
        assert all(by_t[t]["alarm"] == 0 for t in range(15))
        # sustained shift: alarm fires
        assert any(by_t[t]["alarm"] == 1 for t in range(25, 40))

    def test_matches_direct_recursion(self, spark):
        from gofast_spark.ts.changepoint import bernoulli_cusum

        import math

        rows = [(0, 50, 200), (1, 70, 200), (2, 30, 200), (3, 80, 200)]
        df = spark.createDataFrame(rows, "t bigint, k bigint, n bigint")
        out = {r["t"]: r["cusum"] for r in bernoulli_cusum(
            df, "t", "k", "n").collect()}
        l1 = math.floor(math.log(0.3 / 0.2) * 1e6)
        l0 = math.floor(math.log(0.7 / 0.8) * 1e6)
        s = 0
        for t, k, n in [(0, 50, 200), (1, 70, 200), (2, 30, 200), (3, 80, 200)]:
            s = max(0, s + k * l1 + (n - k) * l0)
            assert out[t] == pytest.approx(s / 1e6, abs=1e-12)


class TestCaptureRecapture:
    def test_chapman_textbook_values(self, spark):
        from gofast_spark.stats.descriptive import capture_recapture

        # 100 marked (ids 0-99), 80 second sample (ids 50-129): m=50
        rows = [(i, 1, 1 if 50 <= i < 130 else 0) for i in range(100)] + [
            (i, 0, 1) for i in range(100, 130)
        ]
        df = spark.createDataFrame(rows, "id bigint, a int, b int")
        out = capture_recapture(
            df, "id", F.col("a") == 1, F.col("b") == 1
        ).first()
        assert (out["n1"], out["n2"], out["m"]) == (100, 80, 50)
        assert out["n_hat"] == pytest.approx(
            101 * 81 / 51 - 1, rel=1e-12
        )

    def test_full_overlap_estimates_population(self, spark):
        from gofast_spark.stats.descriptive import capture_recapture

        rows = [(i, 1, 1) for i in range(200)]
        df = spark.createDataFrame(rows, "id bigint, a int, b int")
        out = capture_recapture(
            df, "id", F.col("a") == 1, F.col("b") == 1
        ).first()
        assert out["n_hat"] == pytest.approx(200.0, abs=0.5)
        assert out["se"] == pytest.approx(0.0, abs=1e-9)


class TestAtkinson:
    def test_equal_values_zero(self, spark):
        from gofast_spark.stats.descriptive import atkinson_index

        df = spark.createDataFrame([(10.0,)] * 50, "v double")
        out = atkinson_index(df, "v").first()
        assert out["atkinson_1"] == pytest.approx(0.0, abs=1e-6)

    def test_unequal_matches_closed_form(self, spark):
        from gofast_spark.stats.descriptive import atkinson_index

        import math

        vals = [1.0, 1.0, 4.0, 16.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = atkinson_index(df, "v").first()
        geo = math.exp(sum(math.log(v) for v in vals) / 4)
        ref = 1 - geo / (sum(vals) / 4)
        assert out["atkinson_1"] == pytest.approx(ref, abs=1e-5)
        assert 0 < out["atkinson_1"] < 1


class TestChao1:
    def test_hand_computed(self, spark):
        from gofast_spark.text.analysis import chao1_vocabulary

        # counts: a=3, b=1, c=1, d=2 -> V=4, V1=2, V2=1
        df = spark.createDataFrame(
            [(1, "a a a b c d d")], "doc_id bigint, text string"
        )
        out = chao1_vocabulary(df, "text").first()
        assert out["n_types"] == 4
        assert out["singletons"] == 2 and out["doubletons"] == 1
        # chao1 = 4 + 2*1/(2*2) = 4.5
        assert out["chao1"] == pytest.approx(4.5, abs=1e-12)

    def test_saturated_corpus_no_unseen(self, spark):
        from gofast_spark.text.analysis import chao1_vocabulary

        df = spark.createDataFrame(
            [(1, "x x x y y y z z z")], "doc_id bigint, text string"
        )
        out = chao1_vocabulary(df, "text").first()
        assert out["singletons"] == 0
        assert out["unseen_types_est"] == 0.0


class TestTokenEvenness:
    def test_uniform_tokens_evenness_one(self, spark):
        from gofast_spark.text.analysis import token_evenness_by_group

        df = spark.createDataFrame(
            [(1, "s1", "alpha beta gamma delta")],
            "doc_id bigint, src string, text string",
        )
        out = token_evenness_by_group(df, "text", "src").first()
        assert out["evenness"] == pytest.approx(1.0, abs=1e-4)

    def test_head_heavy_lower_than_uniform(self, spark):
        from gofast_spark.text.analysis import token_evenness_by_group

        rows = [
            (1, "flat", "a b c d e f g h"),
            (2, "heavy", "x x x x x x y z"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, src string, text string"
        )
        out = {
            r["src"]: r
            for r in token_evenness_by_group(df, "text", "src").collect()
        }
        assert out["heavy"]["evenness"] < out["flat"]["evenness"]

    def test_single_type_group_null(self, spark):
        from gofast_spark.text.analysis import token_evenness_by_group

        df = spark.createDataFrame(
            [(1, "mono", "same same same")],
            "doc_id bigint, src string, text string",
        )
        out = token_evenness_by_group(df, "text", "src").first()
        assert out["evenness"] is None
