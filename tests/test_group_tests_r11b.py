"""Unit tests for Mood's median, Jonckheere-Terpstra, and Page trend
tests — hand-computed small cases plus directional sanity on
synthetic data."""

from __future__ import annotations

import numpy as np
import pytest


class TestMoodMedian:
    def test_identical_groups_small_chi2(self, spark):
        from gofast_spark.stats.inferential import mood_median_test

        rows = [(g, float(v)) for g in ("a", "b") for v in range(1, 101)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = mood_median_test(df, "v", "g").first()
        assert out["n"] == 200
        assert out["k_groups"] == 2
        assert out["dof"] == 1
        assert out["chi2_u9"] / 1e9 < 0.1

    def test_shifted_group_detected(self, spark):
        from gofast_spark.stats.inferential import mood_median_test

        rows = [("lo", float(v)) for v in range(100)] + [
            ("hi", float(v + 1000)) for v in range(100)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = mood_median_test(df, "v", "g").first()
        # complete separation: chi2 ~ n
        assert out["chi2_u9"] / 1e9 > 100.0

    def test_lower_median_threshold(self, spark):
        from gofast_spark.stats.inferential import mood_median_test

        # n=4 values 1..4: lower median = 2; above = {3,4}
        rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = mood_median_test(df, "v", "g").first()
        assert out["n_above"] == 2
        # perfect 2x2 separation: chi2 = n = 4
        assert out["chi2_u9"] == 4_000_000_000


class TestJonckheereTerpstra:
    def _jt2_brute(self, samples):
        keys = sorted(samples)
        tot = 0
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                for xa in samples[keys[i]]:
                    for xb in samples[keys[j]]:
                        if xa < xb:
                            tot += 2
                        elif xa == xb:
                            tot += 1
        return tot

    def test_matches_bruteforce_with_ties(self, spark):
        from gofast_spark.stats.inferential import jonckheere_terpstra

        samples = {
            "a": [1.0, 2.0, 2.0, 5.0],
            "b": [2.0, 3.0, 3.0],
            "c": [3.0, 4.0, 6.0, 6.0],
        }
        rows = [(g, v) for g, vs in samples.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v double")
        out = jonckheere_terpstra(df, "v", "g").first()
        assert out["jt2"] == self._jt2_brute(samples)
        assert out["n"] == 11
        assert out["k_groups"] == 3

    def test_monotone_trend_positive_z(self, spark):
        from gofast_spark.stats.inferential import jonckheere_terpstra

        rng = np.random.RandomState(8)
        rows = []
        for i, g in enumerate(("g1", "g2", "g3")):
            rows += [(g, float(x)) for x in rng.normal(i * 3.0, 1.0, 60)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = jonckheere_terpstra(df, "v", "g").first()
        assert out["z"] > 5.0
        # under a strong trend JT2 approaches its max 2 * sum na*nb
        assert out["jt2"] <= 2 * (60 * 60 * 3)

    def test_null_z_near_zero(self, spark):
        from gofast_spark.stats.inferential import jonckheere_terpstra

        rng = np.random.RandomState(12)
        rows = [
            (g, float(x))
            for g in ("g1", "g2", "g3")
            for x in rng.normal(0.0, 1.0, 80)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = jonckheere_terpstra(df, "v", "g").first()
        assert abs(out["z"]) < 3.0


class TestPageTrend:
    def test_perfect_trend_hits_max_l(self, spark):
        from gofast_spark.stats.inferential import page_trend_test

        # 4 blocks, 5 treatments, value strictly increasing with t:
        # every block ranks 1..5 in treatment order -> L = b * sum j*j
        rows = [
            (b, t, float(t * 10 + b))
            for b in range(1, 5)
            for t in range(1, 6)
        ]
        df = spark.createDataFrame(rows, "b int, t int, v double")
        out = page_trend_test(df, "b", "t", "v").first()
        assert out["b_blocks"] == 4
        assert out["k_treatments"] == 5
        l_max = 4 * sum(j * j for j in range(1, 6))
        assert out["l2"] == 2 * l_max
        assert out["z"] > 3.0

    def test_incomplete_blocks_excluded(self, spark):
        from gofast_spark.stats.inferential import page_trend_test

        rows = [
            (b, t, float(t + b))
            for b in range(1, 4)
            for t in range(1, 4)
        ]
        rows.append((9, 1, 5.0))  # block 9 has only 1 of 3 treatments
        df = spark.createDataFrame(rows, "b int, t int, v double")
        out = page_trend_test(df, "b", "t", "v").first()
        assert out["b_blocks"] == 3

    def test_tied_values_average_ranks(self, spark):
        from gofast_spark.stats.inferential import page_trend_test

        # one block, all 3 values tied: every avg rank = 2 -> r2 = 4
        rows = [(1, t, 7.0) for t in range(1, 4)]
        df = spark.createDataFrame(rows, "b int, t int, v double")
        out = page_trend_test(df, "b", "t", "v").first()
        # L2 = sum j * 4 = 4 * (1+2+3) = 24
        assert out["l2"] == 24
