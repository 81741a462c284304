"""Direct edge-case tests for metrics.py ranking/report functions and
stats/descriptive.py — hand-computed NDCG/precision@k, weighted-median
boundary weights, Gini on degenerate distributions, report columns on
perfect and null-bearing predictions."""

from __future__ import annotations

import math

import pytest


class TestRankingMetrics:
    def test_precision_at_k_hand_computed(self, spark):
        from gofast_spark.metrics import precision_at_k

        # q1 top-2 by score: (s=.9,rel=1), (s=.8,rel=0) -> 1/2
        # q2 top-2: (s=.7,rel=1), (s=.6,rel=1) -> 2/2
        rows = [
            ("q1", 0.9, 1), ("q1", 0.8, 0), ("q1", 0.5, 1),
            ("q2", 0.7, 1), ("q2", 0.6, 1), ("q2", 0.1, 0),
        ]
        df = spark.createDataFrame(rows, "q string, s double, rel int")
        got = precision_at_k(df, "q", "s", "rel", 2).first()
        assert got["precision_at_2"] == pytest.approx(0.75)

    def test_precision_at_k_counts_k_not_available(self, spark):
        """The @k denominator is k even when a query has fewer rows
        (standard precision@k definition)."""
        from gofast_spark.metrics import precision_at_k

        df = spark.createDataFrame(
            [("q", 0.9, 1)], "q string, s double, rel int"
        )
        assert precision_at_k(df, "q", "s", "rel", 4).first()[
            "precision_at_4"
        ] == pytest.approx(0.25)

    def test_ndcg_perfect_and_inverted(self, spark):
        from gofast_spark.metrics import ndcg_at_k

        # perfect ranking -> NDCG 1
        perfect = spark.createDataFrame(
            [("q", 3.0, 2), ("q", 2.0, 1), ("q", 1.0, 0)],
            "q string, s double, rel int",
        )
        assert ndcg_at_k(perfect, "q", "s", "rel", 3).first()[
            "ndcg_at_3"
        ] == pytest.approx(1.0)
        # worst ranking of rel=[0,1,2]:
        # dcg = (2^0-1)/log2(2) + (2^1-1)/log2(3) + (2^2-1)/log2(4)
        inverted = spark.createDataFrame(
            [("q", 3.0, 0), ("q", 2.0, 1), ("q", 1.0, 2)],
            "q string, s double, rel int",
        )
        dcg = 0.0 + 1.0 / math.log2(3) + 3.0 / math.log2(4)
        idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3) + 0.0
        assert ndcg_at_k(inverted, "q", "s", "rel", 3).first()[
            "ndcg_at_3"
        ] == pytest.approx(dcg / idcg)

    def test_quantile_loss_asymmetry(self, spark):
        from gofast_spark.metrics import quantile_loss

        # e = y - yhat = +2 and -2; pinball(q=.9): max(.9*2, -.1*2)=1.8
        # and max(.9*-2, -.1*-2)=0.2 -> mean 1.0
        df = spark.createDataFrame(
            [(3.0, 1.0), (1.0, 3.0)], "y double, yhat double"
        )
        assert quantile_loss(df, "y", "yhat", q=0.9).first()[
            "quantile_loss"
        ] == pytest.approx(1.0)
        # q=0.5 is half the MAE
        assert quantile_loss(df, "y", "yhat", q=0.5).first()[
            "quantile_loss"
        ] == pytest.approx(1.0)


class TestReports:
    def test_regression_report_perfect_fit(self, spark):
        from gofast_spark.metrics import regression_report

        df = spark.createDataFrame(
            [(float(i), float(i)) for i in range(1, 9)],
            "y double, p double",
        )
        r = regression_report(df, "y", "p", n_features=1).first()
        assert r["mae"] == 0.0 and r["rmse"] == 0.0
        assert r["median_ae"] == 0.0
        assert r["r2"] == pytest.approx(1.0)
        assert r["adj_r2"] == pytest.approx(1.0)
        assert r["n"] == 8

    def test_regression_report_mape_skips_zero_y(self, spark):
        from gofast_spark.metrics import regression_report

        df = spark.createDataFrame(
            [(0.0, 5.0), (10.0, 5.0)], "y double, p double"
        )
        r = regression_report(df, "y", "p").first()
        # only y=10 contributes: |(-5)/10| = .5 (y=0 would divide by 0)
        assert r["mape"] == pytest.approx(0.5)

    def test_classification_report_hand_counts(self, spark):
        from gofast_spark.metrics import classification_report

        # tp=2 fp=1 fn=1 tn=2 -> acc 4/6, prec 2/3, rec 2/3
        rows = [(1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0)]
        df = spark.createDataFrame(rows, "y int, p int")
        r = classification_report(df, "y", "p").first()
        assert r["accuracy"] == pytest.approx(4 / 6)
        assert r["precision"] == pytest.approx(2 / 3)
        assert r["recall"] == pytest.approx(2 / 3)
        assert r["f1"] == pytest.approx(2 / 3)
        assert r["hamming_loss"] == pytest.approx(2 / 6)

    def test_mean_poisson_deviance_exact_fit(self, spark):
        from gofast_spark.metrics import mean_poisson_deviance

        df = spark.createDataFrame(
            [(0.0, 1.0), (2.0, 1.0)], "y double, p double"
        )
        # y=0: 0 - (0-1) = 1; y=2: 2*ln(2) - 1; deviance = mean*2
        expect = 2 * ((1.0) + (2 * math.log(2.0) - 1.0)) / 2
        assert mean_poisson_deviance(df, "y", "p").first()[
            "poisson_deviance"
        ] == pytest.approx(expect)


class TestDescriptive:
    def test_hmean_and_range(self, spark):
        from gofast_spark.stats.descriptive import get_range, hmean

        df = spark.createDataFrame([(1.0,), (2.0,), (4.0,)], "x double")
        assert hmean(df, "x").first()["hmean"] == pytest.approx(
            3 / (1 + 0.5 + 0.25)
        )
        assert get_range(df, "x").first()["range"] == 3.0

    def test_mode_smallest_tie(self, spark):
        from gofast_spark.stats.descriptive import mode_of

        df = spark.createDataFrame(
            [(5,), (5,), (3,), (3,), (9,)], "x int"
        )
        assert mode_of(df, "x").first()["mode"] == 3  # tie -> smallest

    def test_quartiles_exact(self, spark):
        from gofast_spark.stats.descriptive import quartiles

        df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "x double")
        r = quartiles(df, "x").first()
        assert (r["q1"], r["q2"], r["q3"]) == (2.0, 3.0, 4.0)

    def test_gini_degenerate_and_concentrated(self, spark):
        from gofast_spark.stats.descriptive import gini_coeff

        equal = spark.createDataFrame([(5.0,)] * 4, "x double")
        assert gini_coeff(equal, "x").first()["gini"] == pytest.approx(0.0)
        # one holder of everything among n=4: gini = (n-1)/n = .75
        conc = spark.createDataFrame(
            [(0.0,), (0.0,), (0.0,), (100.0,)], "x double"
        )
        assert gini_coeff(conc, "x").first()["gini"] == pytest.approx(0.75)

    def test_weighted_median_boundary(self, spark):
        from gofast_spark.stats.descriptive import weighted_median

        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 1.0), (3.0, 2.0)], "v double, w double"
        )
        # cum weights: 1/4, 2/4, 4/4 -> first >= .5 is v=2
        assert weighted_median(df, "v", "w").first()[
            "weighted_median"
        ] == 2.0
        # dominant weight wins regardless of value order
        dom = spark.createDataFrame(
            [(10.0, 9.0), (1.0, 0.5), (2.0, 0.5)], "v double, w double"
        )
        assert weighted_median(dom, "v", "w").first()[
            "weighted_median"
        ] == 10.0
