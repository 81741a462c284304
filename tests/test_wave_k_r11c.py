"""Unit tests for the round-11 third breadth wave: point-biserial,
rank-biserial, the 2x2 odds-ratio report, and Fligner-Killeen."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestPointBiserial:
    def test_matches_numpy_pearson(self, spark):
        from gofast_spark.stats.relationships import point_biserial

        rng = np.random.RandomState(11)
        y = (rng.rand(200) < 0.4).astype(int)
        v = np.round(rng.normal(5, 2, 200) + y * 1.5, 2)
        df = spark.createDataFrame(
            [(int(a), float(b)) for a, b in zip(y, v)], "y int, v double"
        )
        out = point_biserial(df, "v", F.col("y") == 1).first()
        ref = np.corrcoef(y, v)[0, 1]
        assert out["r_pb"] == pytest.approx(ref, abs=1e-9)
        assert out["n"] == 200
        assert out["n1"] == int(y.sum())

    def test_perfect_separation_sign(self, spark):
        from gofast_spark.stats.relationships import point_biserial

        rows = [(1, 10.0), (1, 11.0), (0, 1.0), (0, 2.0)]
        df = spark.createDataFrame(rows, "y int, v double")
        out = point_biserial(df, "v", F.col("y") == 1).first()
        assert out["r_pb"] > 0.99


class TestRankBiserial:
    def test_matches_dominance_formula(self, spark):
        from gofast_spark.stats.relationships import rank_biserial

        rng = np.random.RandomState(3)
        a = np.round(rng.normal(6, 2, 80), 1)
        b = np.round(rng.normal(5, 2, 120), 1)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        out = rank_biserial(df, "v", "g", "a", "b", bins=None).first()
        u = sum(
            (ai > bi) + 0.5 * (ai == bi) for ai in a for bi in b
        )
        ref = 2.0 * u / (len(a) * len(b)) - 1.0
        assert out["r_rb"] == pytest.approx(ref, abs=1e-9)

    def test_total_dominance_is_one(self, spark):
        from gofast_spark.stats.relationships import rank_biserial

        rows = [("a", float(v)) for v in (10, 11, 12)] + [
            ("b", float(v)) for v in (1, 2, 3)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = rank_biserial(df, "v", "g", "a", "b", bins=None).first()
        assert out["r_rb"] == pytest.approx(1.0, abs=1e-12)


class TestOddsRatio2x2:
    def test_matches_direct_cells(self, spark):
        from gofast_spark.stats.inferential import odds_ratio_2x2

        rng = np.random.RandomState(5)
        e = (rng.rand(400) < 0.5).astype(int)
        o = (rng.rand(400) < (0.3 + 0.2 * e)).astype(int)
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(e, o)], "e int, o int"
        )
        out = odds_ratio_2x2(
            df, F.col("e") == 1, F.col("o") == 1
        ).first()
        a = int(((e == 1) & (o == 1)).sum())
        b = int(((e == 1) & (o == 0)).sum())
        c = int(((e == 0) & (o == 1)).sum())
        d = int(((e == 0) & (o == 0)).sum())
        assert (out["a"], out["b"], out["c"], out["d"]) == (a, b, c, d)
        assert out["odds_ratio"] == pytest.approx(
            a * d / (b * c), rel=1e-12
        )
        assert out["risk_ratio"] == pytest.approx(
            (a / (a + b)) / (c / (c + d)), rel=1e-12
        )
        assert out["or_lo"] < out["odds_ratio"] < out["or_hi"]
        assert out["corrected"] == 0

    def test_zero_cell_haldane_correction(self, spark):
        from gofast_spark.stats.inferential import odds_ratio_2x2

        # d-cell empty: every unexposed row has the outcome
        rows = [(1, 1)] * 3 + [(1, 0)] * 2 + [(0, 1)] * 4
        df = spark.createDataFrame(rows, "e int, o int")
        out = odds_ratio_2x2(
            df, F.col("e") == 1, F.col("o") == 1
        ).first()
        assert out["corrected"] == 1
        # corrected cells: a=3.5 b=2.5 c=4.5 d=0.5
        assert out["odds_ratio"] == pytest.approx(
            (3.5 * 0.5) / (2.5 * 4.5), rel=1e-12
        )
        assert np.isfinite(out["or_lo"]) and np.isfinite(out["or_hi"])


class TestFlignerKilleen:
    @staticmethod
    def _ref(x, g):
        from statistics import NormalDist

        xq = np.round(x * 1000).astype(np.int64)
        d = np.empty_like(xq)
        for t in np.unique(g):
            m = np.sort(xq[g == t])
            d[g == t] = np.abs(xq[g == t] - m[(len(m) + 1) // 2 - 1])
        order = np.argsort(d, kind="stable")
        n = len(d)
        ranks = np.empty(n, float)
        sd = d[order]
        i = 0
        while i < n:
            j = i
            while j + 1 < n and sd[j + 1] == sd[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        a = np.array(
            [NormalDist().inv_cdf(0.5 + r / (2 * (n + 1))) for r in ranks]
        )
        abar = a.mean()
        v = a.var(ddof=1)
        num = sum(
            len(a[g == t]) * (a[g == t].mean() - abar) ** 2
            for t in np.unique(g)
        )
        return num / v

    def test_matches_pure_python_reference(self, spark):
        from gofast_spark.stats.inferential import fligner_killeen

        rng = np.random.RandomState(7)
        g = rng.choice(["a", "b", "c"], 300)
        sd = np.where(g == "a", 1.0, np.where(g == "b", 2.0, 0.5))
        x = np.round(rng.normal(10, sd), 3)
        df = spark.createDataFrame(
            [(str(gi), float(xi)) for gi, xi in zip(g, x)],
            "g string, v double",
        )
        out = fligner_killeen(df, "v", "g").first()
        # u6 score quantization bounds the drift far below 1e-3
        assert out["fk_stat"] == pytest.approx(
            self._ref(x, g), abs=1e-3
        )
        assert out["dof"] == 2
        assert out["n"] == 300

    def test_equal_variances_small_statistic(self, spark):
        from gofast_spark.stats.inferential import fligner_killeen

        rng = np.random.RandomState(9)
        g = rng.choice(["a", "b"], 200)
        x = np.round(rng.normal(0, 1, 200), 3)
        df = spark.createDataFrame(
            [(str(gi), float(xi)) for gi, xi in zip(g, x)],
            "g string, v double",
        )
        out = fligner_killeen(df, "v", "g").first()
        # chi2(1) 99th percentile is 6.63; equal variances stay below
        assert out["fk_stat"] < 6.63

    def test_even_group_uses_lower_median(self, spark):
        from gofast_spark.stats.inferential import fligner_killeen

        # group a has 4 values: lower median is 2 (not 2.5); scores of
        # |x - 2| = (1, 0, 1, 2) differ from the upper-median centring
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)] + [
            ("b", 1.0),
            ("b", 5.0),
            ("b", 9.0),
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = fligner_killeen(df, "v", "g").first()
        assert out["fk_stat"] == pytest.approx(
            self._ref(
                np.array([1.0, 2.0, 3.0, 4.0, 1.0, 5.0, 9.0]),
                np.array(["a", "a", "a", "a", "b", "b", "b"]),
            ),
            abs=1e-3,
        )


class TestLexicalRichness:
    def test_hand_computed_counts(self, spark):
        from gofast_spark.text.analysis import lexical_richness

        rows = [(1, "the cat sat on the mat"), (2, "the cat ran")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = lexical_richness(df, "text").first()
        # tokens: the x3, cat x2, sat, on, mat, ran -> N=9, V=6, V1=4
        assert out["n_tokens"] == 9
        assert out["n_types"] == 6
        assert out["hapax_types"] == 4
        assert out["ttr"] == pytest.approx(6 / 9, abs=1e-12)
        assert out["hapax_ratio"] == pytest.approx(4 / 6, abs=1e-12)
        # sum c^2 = 9+4+1+1+1+1 = 17; K = 1e4*(17-9)/81
        assert out["yule_k"] == pytest.approx(1e4 * 8 / 81, abs=1e-9)

    def test_uniform_corpus_zero_k(self, spark):
        from gofast_spark.text.analysis import lexical_richness

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id bigint, text string"
        )
        out = lexical_richness(df, "text").first()
        # every type occurs once: sum c^2 = N, so K = 0 and TTR = 1
        assert out["yule_k"] == 0.0
        assert out["ttr"] == 1.0


class TestCrossPerplexity:
    def test_memorized_split_matches_hand_model(self, spark):
        from gofast_spark.text.analysis import cross_perplexity

        import math

        rows = [(1, "a b a"), (2, "b c"), (5, "a c d")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = cross_perplexity(df, "text", "doc_id", holdout_mod=5).first()
        # train (ids 1,2): tokens a a b b c -> N=5, V=3
        assert out["n_train_tokens"] == 5
        assert out["n_train_types"] == 3
        assert out["n_test_tokens"] == 3
        assert out["oov_tokens"] == 1  # 'd'
        denom = 5 + 3 + 1
        # u6-quantized ln p per type, then weighted
        lnp = {
            "a": math.floor(math.log(3 / denom) * 1e6),
            "c": math.floor(math.log(2 / denom) * 1e6),
            "d": math.floor(math.log(1 / denom) * 1e6),
        }
        h = -sum(lnp.values()) / 1e6 / 3
        assert out["cross_entropy"] == pytest.approx(h, abs=1e-9)
        assert out["perplexity"] == pytest.approx(math.exp(h), rel=1e-9)

    def test_lower_perplexity_for_matching_distribution(self, spark):
        from gofast_spark.text.analysis import cross_perplexity

        same = [(i, "alpha beta gamma alpha") for i in range(1, 11)]
        df_same = spark.createDataFrame(same, "doc_id bigint, text string")
        shifted = [
            (i, "alpha beta gamma alpha" if i % 5 != 0 else "zeta eta theta")
            for i in range(1, 11)
        ]
        df_shift = spark.createDataFrame(
            shifted, "doc_id bigint, text string"
        )
        ppl_same = cross_perplexity(df_same, "text", "doc_id").first()[
            "perplexity"
        ]
        ppl_shift = cross_perplexity(df_shift, "text", "doc_id").first()[
            "perplexity"
        ]
        assert ppl_same < ppl_shift


class TestHerfindahl:
    def test_monopoly_and_uniform(self, spark):
        from gofast_spark.stats.descriptive import herfindahl_index

        rows = [("g1", "m1", 10.0), ("g1", "m2", 10.0), ("g1", "m3", 10.0),
                ("g1", "m4", 10.0), ("g2", "m1", 40.0)]
        df = spark.createDataFrame(rows, "g string, m string, v double")
        out = {
            r["g"]: r
            for r in herfindahl_index(df, "v", "m", ["g"]).collect()
        }
        assert out["g1"]["hhi"] == pytest.approx(0.25, abs=1e-12)
        assert out["g1"]["n_effective"] == pytest.approx(4.0, abs=1e-9)
        assert out["g2"]["hhi"] == pytest.approx(1.0, abs=1e-12)
        assert out["g2"]["n_members"] == 1

    def test_member_level_aggregation_first(self, spark):
        from gofast_spark.stats.descriptive import herfindahl_index

        # m1 split across rows must aggregate before squaring:
        # shares (0.5, 0.5) -> 0.5, not (0.25,0.25,0.5) -> 0.375
        rows = [("m1", 1.0), ("m1", 1.0), ("m2", 2.0)]
        df = spark.createDataFrame(rows, "m string, v double")
        out = herfindahl_index(df, "v", "m").first()
        assert out["hhi"] == pytest.approx(0.5, abs=1e-12)


class TestVonNeumann:
    def test_alternating_series_high_ratio(self, spark):
        from gofast_spark.ts.engineering import von_neumann_ratio

        rows = [(i, float(i % 2)) for i in range(40)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = von_neumann_ratio(df, "v", "t").first()
        assert out["vn_ratio"] > 3.5
        assert out["z"] > 4.0

    def test_trend_series_low_ratio(self, spark):
        from gofast_spark.ts.engineering import von_neumann_ratio

        rows = [(i, float(i)) for i in range(40)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = von_neumann_ratio(df, "v", "t").first()
        assert out["vn_ratio"] < 0.2
        assert out["z"] < -4.0

    def test_matches_numpy_formula(self, spark):
        from gofast_spark.ts.engineering import von_neumann_ratio

        rng = np.random.RandomState(13)
        x = np.round(rng.normal(0, 1, 60), 4)
        rows = [(i, float(v)) for i, v in enumerate(x)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = von_neumann_ratio(df, "v", "t").first()
        d2 = np.sum(np.diff(x) ** 2) / (len(x) - 1)
        s2 = np.sum((x - x.mean()) ** 2) / len(x)
        assert out["vn_ratio"] == pytest.approx(d2 / s2, rel=1e-9)


class TestCoxStuart:
    def test_monotone_trend_all_plus(self, spark):
        from gofast_spark.ts.engineering import cox_stuart_test

        rows = [(i, float(i)) for i in range(20)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = cox_stuart_test(df, "v", "t").first()
        assert out["n_pairs"] == 10
        assert out["n_plus"] == 10
        assert out["n_minus"] == 0
        assert out["z"] == pytest.approx(10 / np.sqrt(10), abs=1e-12)

    def test_odd_length_drops_middle(self, spark):
        from gofast_spark.ts.engineering import cox_stuart_test

        rows = [(i, float(-i)) for i in range(21)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = cox_stuart_test(df, "v", "t").first()
        assert out["n"] == 21
        assert out["n_pairs"] == 10
        assert out["n_minus"] == 10
        assert out["z"] < -3.0

    def test_ties_drop_out(self, spark):
        from gofast_spark.ts.engineering import cox_stuart_test

        rows = [(i, 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = cox_stuart_test(df, "v", "t").first()
        assert out["n_plus"] == 0 and out["n_minus"] == 0
        assert out["n_pairs"] == 5
        assert out["z"] is None  # ANSI guard: no informative pairs


class TestEnergyDistance:
    @staticmethod
    def _ref(a, b):
        # direct pairwise form: 2 E|X-Y| - E|X-X'| - E|Y-Y'|
        a = np.asarray(a, float)
        b = np.asarray(b, float)
        exy = np.abs(a[:, None] - b[None, :]).mean()
        exx = np.abs(a[:, None] - a[None, :]).mean()
        eyy = np.abs(b[:, None] - b[None, :]).mean()
        return 2 * exy - exx - eyy

    def test_matches_pairwise_identity(self, spark):
        from gofast_spark.stats.inferential import energy_distance_1d

        rng = np.random.RandomState(17)
        a = np.round(rng.normal(0, 1, 60), 3)
        b = np.round(rng.normal(0.7, 1.5, 80), 3)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        out = energy_distance_1d(df, "v", "g", "a", "b").first()
        # the V-statistic (with diagonal) pairwise form equals the
        # 2*integral (F-G)^2 identity exactly
        assert out["d2_energy"] == pytest.approx(
            self._ref(a, b), rel=1e-9
        )
        assert out["n_a"] == 60 and out["n_b"] == 80

    def test_identical_samples_zero(self, spark):
        from gofast_spark.stats.inferential import energy_distance_1d

        vals = [1.0, 2.0, 3.0, 4.0]
        rows = [("a", v) for v in vals] + [("b", v) for v in vals]
        df = spark.createDataFrame(rows, "g string, v double")
        out = energy_distance_1d(df, "v", "g", "a", "b").first()
        assert out["d2_energy"] == 0.0


class TestLiftTable:
    def test_perfect_score_top_bin_lift(self, spark):
        from gofast_spark.stats.evaluation import lift_table

        # scores 0..99; positives are exactly the top 10 scores
        rows = [(float(i), 1 if i >= 90 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "s double, y int")
        out = {
            r["bin"]: r
            for r in lift_table(df, "s", F.col("y") == 1).collect()
        }
        assert len(out) == 10
        top = out[9]
        assert top["n"] == 10 and top["n_pos"] == 10
        assert top["gain"] == pytest.approx(1.0, abs=1e-12)
        assert top["lift"] == pytest.approx(10.0, abs=1e-9)
        # bottom cumulative row covers everything: lift 1, gain 1
        bot = out[0]
        assert bot["cum_n"] == 100
        assert bot["lift"] == pytest.approx(1.0, abs=1e-12)

    def test_random_outcome_lift_near_one(self, spark):
        from gofast_spark.stats.evaluation import lift_table

        rng = np.random.RandomState(23)
        rows = [
            (float(s), int(y))
            for s, y in zip(rng.rand(2000) * 10, rng.rand(2000) < 0.3)
        ]
        df = spark.createDataFrame(rows, "s double, y int")
        rowsout = lift_table(df, "s", F.col("y") == 1).collect()
        for r in rowsout:
            assert r["lift"] == pytest.approx(1.0, abs=0.35)


class TestWilsonInterval:
    def test_textbook_values(self, spark):
        from gofast_spark.stats.inferential import wilson_interval

        # k=8, n=10: Wilson 95% ~ (0.4902, 0.9433)
        rows = [(1,)] * 8 + [(0,)] * 2
        df = spark.createDataFrame(rows, "y int")
        out = wilson_interval(df, F.col("y") == 1).first()
        assert out["p_hat"] == pytest.approx(0.8, abs=1e-12)
        assert out["wilson_lo"] == pytest.approx(0.4902, abs=2e-3)
        assert out["wilson_hi"] == pytest.approx(0.9433, abs=2e-3)
        # Wilson stays inside [0,1] where Wald can escape
        assert 0.0 <= out["wilson_lo"] <= out["wilson_hi"] <= 1.0

    def test_extreme_proportion_bounds(self, spark):
        from gofast_spark.stats.inferential import wilson_interval

        rows = [(1,)] * 10
        df = spark.createDataFrame(rows, "y int")
        out = wilson_interval(df, F.col("y") == 1).first()
        # p_hat = 1: Wald collapses to [1,1]; Wilson lower bound < 1
        assert out["wald_lo"] == pytest.approx(1.0, abs=1e-12)
        assert out["wilson_lo"] < 1.0
        assert out["wilson_hi"] <= 1.0 + 1e-12




class TestVifThree:
    def test_matches_numpy_inverse(self, spark):
        from gofast_spark.stats.relationships import vif_three

        rng = np.random.RandomState(29)
        x1 = rng.normal(0, 1, 300)
        x2 = np.round(0.8 * x1 + 0.6 * rng.normal(0, 1, 300), 2)
        x3 = np.round(rng.normal(0, 1, 300), 2)
        x1 = np.round(x1, 2)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, x3)],
            "a double, b double, c double",
        )
        out = vif_three(
            df, ["a", "b", "c"], quantize=(100, 100, 100)
        ).first()
        r = np.corrcoef(np.vstack([x1, x2, x3]))
        inv = np.linalg.inv(r)
        assert out["vif_1"] == pytest.approx(inv[0, 0], rel=1e-9)
        assert out["vif_2"] == pytest.approx(inv[1, 1], rel=1e-9)
        assert out["vif_3"] == pytest.approx(inv[2, 2], rel=1e-9)
        # collinear pair inflates its two VIFs well above the third
        assert out["vif_1"] > 1.5 and out["vif_2"] > 1.5
        assert out["vif_3"] < 1.2

    def test_orthogonal_regressors_unit_vif(self, spark):
        from gofast_spark.stats.relationships import vif_three

        # perfectly balanced orthogonal design
        rows = [
            (1.0, 1.0, 1.0), (1.0, -1.0, -1.0),
            (-1.0, 1.0, -1.0), (-1.0, -1.0, 1.0),
        ] * 5
        df = spark.createDataFrame(rows, "a double, b double, c double")
        out = vif_three(df, ["a", "b", "c"], quantize=(1, 1, 1)).first()
        for k in ("vif_1", "vif_2", "vif_3"):
            assert out[k] == pytest.approx(1.0, abs=1e-12)


class TestJackknifeRatio:
    def test_matches_direct_loo(self, spark):
        from gofast_spark.stats.resampling import jackknife_ratio

        rng = np.random.RandomState(31)
        y = rng.randint(1, 20, 100)
        x = np.round(y * 3.0 + rng.normal(0, 2, 100), 2)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(x, y)],
            "x double, y bigint",
        )
        out = jackknife_ratio(df, "x", "y").first()
        sx, sy, n = x.sum(), y.sum(), len(x)
        # replicate the u-quantization contract exactly
        xq = np.floor(x * 1e6 + 0.5)
        r = np.floor((xq.sum() - xq) / (sy - y) * 1e3)
        rbar = r.sum() / n / 1e9
        var = (n - 1) / n * ((r**2).sum() - r.sum() ** 2 / n) / 1e18
        assert out["theta_hat"] == pytest.approx(
            xq.sum() / sy / 1e6, rel=1e-12
        )
        assert out["theta_jack"] == pytest.approx(rbar, rel=1e-9)
        assert out["se_jack"] == pytest.approx(np.sqrt(var), rel=1e-9)

    def test_constant_ratio_zero_variance(self, spark):
        from gofast_spark.stats.resampling import jackknife_ratio

        rows = [(6.0, 2), (9.0, 3), (15.0, 5)]
        df = spark.createDataFrame(rows, "x double, y bigint")
        out = jackknife_ratio(df, "x", "y").first()
        assert out["theta_hat"] == pytest.approx(3.0, abs=1e-9)
        assert out["se_jack"] == pytest.approx(0.0, abs=1e-6)


class TestQQNormal:
    def test_standard_normalish_sample(self, spark):
        from gofast_spark.stats.evaluation import qq_normal_points

        rng = np.random.RandomState(37)
        x = np.round(rng.normal(50, 10, 5000), 2)
        df = spark.createDataFrame([(float(v),) for v in x], "v double")
        rows = qq_normal_points(df, "v").collect()
        assert len(rows) == 9
        ps = sorted(r["p"] for r in rows)
        assert ps == pytest.approx([i / 10 for i in range(1, 10)])
        for r in rows:
            # on a genuinely normal sample the QQ diff stays small
            assert abs(r["diff"]) < 1.0
            assert r["diff"] == pytest.approx(
                r["q_emp"] - r["q_theo"], abs=1e-9
            )

    def test_empirical_quantile_is_lower_order_stat(self, spark):
        from gofast_spark.stats.evaluation import qq_normal_points

        vals = [float(i) for i in range(1, 11)]  # 1..10
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = {round(r["p"], 1): r for r in qq_normal_points(df, "v").collect()}
        # rank ceil(p*10): p=0.1 -> 1st order stat = 1.0; p=0.5 -> 5.0
        assert rows[0.1]["q_emp"] == 1.0
        assert rows[0.5]["q_emp"] == 5.0
        assert rows[0.9]["q_emp"] == 9.0


class TestCohensH:
    def test_matches_closed_form(self, spark):
        from gofast_spark.stats.inferential import cohens_h

        import math

        rows = [(1, 1)] * 30 + [(1, 0)] * 70 + [(0, 1)] * 10 + [(0, 0)] * 90
        df = spark.createDataFrame(rows, "g int, s int")
        out = cohens_h(df, F.col("g") == 1, F.col("s") == 1).first()
        ref = 2 * math.asin(math.sqrt(0.3)) - 2 * math.asin(math.sqrt(0.1))
        assert out["h"] == pytest.approx(ref, abs=1e-12)
        assert out["p1"] == pytest.approx(0.3) and out["p2"] == pytest.approx(0.1)

    def test_equal_proportions_zero(self, spark):
        from gofast_spark.stats.inferential import cohens_h

        rows = [(1, 1)] * 5 + [(1, 0)] * 5 + [(0, 1)] * 7 + [(0, 0)] * 7
        df = spark.createDataFrame(rows, "g int, s int")
        out = cohens_h(df, F.col("g") == 1, F.col("s") == 1).first()
        assert out["h"] == pytest.approx(0.0, abs=1e-12)
