"""Unit tests for bigram novelty, the turning-points test, the ZIP
moment fit, and the Markov entropy-rate composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestNgramNovelty:
    def test_disjoint_vocabulary_full_novelty(self, spark):
        from gofast_spark.text.cooccur import ngram_novelty

        rows = [
            (1, "alpha beta gamma alpha beta"),
            (2, "beta gamma delta"),
            (5, "zeta eta theta zeta eta"),  # held out, disjoint
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = ngram_novelty(df, "text", "doc_id", holdout_mod=5).first()
        assert out["type_novelty"] == 1.0
        assert out["occurrence_novelty"] == 1.0
        assert out["n_test_types"] == 3  # zeta|eta, eta|theta, theta|zeta
        assert out["test_occurrences"] == 4

    def test_memorized_split_zero_novelty(self, spark):
        from gofast_spark.text.cooccur import ngram_novelty

        rows = [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),
            (10, "the quick brown fox"),  # held out, fully seen
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = ngram_novelty(df, "text", "doc_id", holdout_mod=5).first()
        assert out["novel_types"] == 0
        assert out["type_novelty"] == 0.0
        assert out["occurrence_novelty"] == 0.0

    def test_short_docs_produce_no_bigrams(self, spark):
        from gofast_spark.text.cooccur import ngram_novelty

        rows = [(1, "hello world"), (5, "single")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = ngram_novelty(df, "text", "doc_id", holdout_mod=5).first()
        assert out["n_test_types"] == 0
        assert out["type_novelty"] == 0.0


class TestTurningPoints:
    def test_monotone_series_no_points(self, spark):
        from gofast_spark.ts.engineering import turning_points_test

        rows = [(i, float(i)) for i in range(30)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = turning_points_test(df, "t", "v").first()
        assert out["n"] == 30
        assert out["t_points"] == 0
        assert out["z"] < -5.0

    def test_alternating_series_all_points(self, spark):
        from gofast_spark.ts.engineering import turning_points_test

        rows = [(i, float(i % 2)) for i in range(30)]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = turning_points_test(df, "t", "v").first()
        assert out["t_points"] == 28
        # n=30: E=18.67, sd~2.24 -> z=(28-18.67)/2.24 ~ 4.17
        assert out["z"] > 4.0

    def test_random_series_near_expected(self, spark):
        from gofast_spark.ts.engineering import turning_points_test

        rng = np.random.RandomState(3)
        rows = [(i, float(v)) for i, v in enumerate(rng.normal(0, 1, 200))]
        df = spark.createDataFrame(rows, "t bigint, v double")
        out = turning_points_test(df, "t", "v").first()
        assert abs(out["z"]) < 3.0
        assert out["expected"] == pytest.approx(2 * 198 / 3, abs=1e-9)


class TestZipMomentFit:
    def test_moment_identities_on_overdispersed_counts(self, spark):
        from gofast_spark.stats.causal import zip_moment_fit

        # bimodal per-key counts (1 or 10) -> var >> mean, so the
        # moment solution must put lambda_hat above the mean and
        # pi_hat in (0, 1)
        rows = []
        kid = 0
        counts = []
        for i in range(600):
            c = 1 if i % 2 == 0 else 10
            counts.append(c)
            rows += [(kid,)] * c
            kid += 1
        df = spark.createDataFrame(rows, "k bigint")
        out = zip_moment_fit(df, "k").first()
        m = float(np.mean(counts))
        v = float(np.var(counts, ddof=1))
        assert out["mean"] == pytest.approx(m, abs=1e-9)
        assert out["variance"] == pytest.approx(v, rel=1e-9)
        lam = (v + m * m - m) / m
        assert out["lambda_hat"] == pytest.approx(lam, rel=1e-9)
        assert out["pi_hat"] == pytest.approx(1.0 - m / lam, rel=1e-9)
        assert out["lambda_hat"] > out["mean"]
        assert 0.0 < out["pi_hat"] < 1.0

    def test_plain_poisson_pi_near_zero(self, spark):
        from gofast_spark.stats.causal import zip_moment_fit

        rng = np.random.RandomState(7)
        rows = []
        for kid in range(3000):
            for _ in range(rng.poisson(5) + 1):
                rows.append((kid,))
        df = spark.createDataFrame(rows, "k bigint")
        out = zip_moment_fit(df, "k").first()
        assert abs(out["pi_hat"]) < 0.1
        assert out["lambda_hat"] == pytest.approx(out["mean"], rel=0.15)


class TestMarkovEntropyComposition:
    def test_deterministic_chain_zero_conditional_entropy(self, spark):
        from gofast_spark.stats.infotheory import entropy_report

        # A -> B -> A -> B ... : next state fully determined
        rows = [("A", "B")] * 50 + [("B", "A")] * 50
        df = spark.createDataFrame(rows, "x string, y string")
        out = entropy_report(df, "x", "y").first()
        assert out["hxy_u6"] - out["hx_u6"] == 0

    def test_independent_next_state_positive(self, spark):
        from gofast_spark.stats.infotheory import entropy_report

        rng = np.random.RandomState(9)
        states = ["A", "B", "C"]
        rows = [
            (states[rng.randint(3)], states[rng.randint(3)])
            for _ in range(3000)
        ]
        df = spark.createDataFrame(rows, "x string, y string")
        out = entropy_report(df, "x", "y").first()
        # H(Y|X) ~ ln 3 ~ 1.0986
        assert (out["hxy_u6"] - out["hx_u6"]) / 1e6 == pytest.approx(
            1.0986, abs=0.05
        )


class TestHolmBonferroni:
    def test_stepdown_monotone_and_classic_example(self, spark):
        from gofast_spark.stats.multiple import holm_bonferroni

        # classic: m=4, p = .01, .02, .03, .04 at alpha=.05
        # adj = max-running of (4*.01, 3*.02, 2*.03, 1*.04)
        #     = .04, .06, .06, .06 -> reject only the first
        rows = [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04)]
        df = spark.createDataFrame(rows, "h string, p double")
        out = {
            r["h"]: r
            for r in holm_bonferroni(
                df, "p", tiebreak_cols=["h"]
            ).collect()
        }
        import pytest as _pt

        assert out["a"]["p_adj"] == _pt.approx(0.04, abs=1e-12)
        assert out["b"]["p_adj"] == _pt.approx(0.06, abs=1e-12)
        assert out["c"]["p_adj"] == _pt.approx(0.06, abs=1e-12)
        assert out["d"]["p_adj"] == _pt.approx(0.06, abs=1e-12)
        assert [out[h]["reject"] for h in "abcd"] == [1, 0, 0, 0]
        # adjusted p's are monotone in rank
        ranked = sorted(out.values(), key=lambda r: r["rank"])
        adj = [r["p_adj"] for r in ranked]
        assert adj == sorted(adj)

    def test_caps_at_one(self, spark):
        from gofast_spark.stats.multiple import holm_bonferroni

        rows = [("a", 0.5), ("b", 0.9)]
        df = spark.createDataFrame(rows, "h string, p double")
        out = holm_bonferroni(df, "p", tiebreak_cols=["h"]).collect()
        assert all(r["p_adj"] <= 1.0 for r in out)
        assert all(r["reject"] == 0 for r in out)
