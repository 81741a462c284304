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
