"""Unit tests for the Wasserstein/KL-JSD/Hellinger drift distances and
the brute-force kNN classifier."""

from __future__ import annotations

import math

import numpy as np
import pytest


def _two_group_df(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [
        ("b", float(v)) for v in b_vals
    ]
    return spark.createDataFrame(rows, "g string, v double")


class TestWasserstein1d:
    def test_known_shift(self, spark):
        from gofast_spark.quality.drift import wasserstein_1d

        # b = a + 3 pointwise: W1 between the empirical laws is exactly 3
        a = [1.0, 2.0, 5.0, 9.0]
        b = [v + 3.0 for v in a]
        df = _two_group_df(spark, a, b)
        out = wasserstein_1d(df, "v", "g", "a", "b").first()
        assert out["n_a"] == 4 and out["n_b"] == 4
        assert out["w1_u9"] == 3_000_000_000

    def test_identical_distributions_zero(self, spark):
        from gofast_spark.quality.drift import wasserstein_1d

        a = [1.0, 4.0, 4.0, 7.5]
        df = _two_group_df(spark, a, a)
        out = wasserstein_1d(df, "v", "g", "a", "b").first()
        assert out["w1_u9"] == 0

    def test_matches_numpy_sorted_mean(self, spark):
        from gofast_spark.quality.drift import wasserstein_1d

        rng = np.random.RandomState(3)
        a = rng.normal(0, 1, 200)
        b = rng.normal(0.5, 1.3, 200)
        df = _two_group_df(spark, a, b)
        out = wasserstein_1d(df, "v", "g", "a", "b").first()
        # equal sizes: W1 = mean |sorted_a - sorted_b|
        expect = float(np.abs(np.sort(a) - np.sort(b)).mean())
        assert out["w1_u9"] / 1e9 == pytest.approx(expect, abs=1e-6)


class TestKlJsdBinned:
    def test_identical_near_zero_and_symmetry(self, spark):
        from gofast_spark.quality.drift import kl_jsd_binned

        rng = np.random.RandomState(5)
        a = rng.uniform(0, 10, 500)
        df = _two_group_df(spark, a, a)
        out = kl_jsd_binned(df, "v", "g", "a", "b").first()
        assert out["kl_ab_u9"] == out["kl_ba_u9"] == 0
        assert out["jsd_u9"] == 0

    def test_shifted_distributions_positive(self, spark):
        from gofast_spark.quality.drift import kl_jsd_binned

        rng = np.random.RandomState(7)
        a = rng.normal(2, 1, 400)
        b = rng.normal(7, 1, 400)
        df = _two_group_df(spark, a, b)
        out = kl_jsd_binned(df, "v", "g", "a", "b").first()
        assert out["kl_ab_u9"] > 1_000_000_000  # KL > 1 nat
        assert out["kl_ba_u9"] > 1_000_000_000
        # JSD bounded by ln 2
        assert 0 < out["jsd_u9"] / 1e9 <= math.log(2.0) + 1e-6


class TestHellingerBinned:
    def test_bounds_and_order(self, spark):
        from gofast_spark.quality.drift import hellinger_binned

        rng = np.random.RandomState(9)
        a = rng.normal(0, 1, 400)
        near = rng.normal(0.3, 1, 400)
        far = rng.normal(8, 1, 400)
        d_near = hellinger_binned(
            _two_group_df(spark, a, near), "v", "g", "a", "b"
        ).first()
        d_far = hellinger_binned(
            _two_group_df(spark, a, far), "v", "g", "a", "b"
        ).first()
        assert 0 <= d_near["h2_u9"] <= 1_000_000_000
        assert d_far["h2_u9"] > d_near["h2_u9"]
        # disjoint supports: BC ~ 0, H^2 ~ 1 — no smoothing blowup
        assert d_far["h2_u9"] > 950_000_000
        assert d_near["bc_u9"] + d_near["h2_u9"] == 1_000_000_000


class TestKnnClassify:
    def test_separable_clusters_perfect(self, spark):
        from gofast_spark.ml.knn import knn_classify

        rng = np.random.RandomState(11)
        rows = []
        for i in range(200):
            label = i % 2
            center = 0.0 if label == 0 else 10.0
            vec = (rng.normal(center, 0.5, 8)).tolist()
            rows.append((i, [float(x) for x in vec], label))
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )
        out = knn_classify(
            df, "vec_id", "embedding", "label", dims=8, k=5
        ).collect()
        assert len(out) == 20  # ids 0,10,...,190
        assert all(r["pred"] == r["label"] for r in out)
        assert all(r["votes"] == 5 for r in out)

    def test_vote_tiebreak_smaller_label(self, spark):
        from gofast_spark.ml.knn import knn_classify

        # one query at the origin; k=4 neighbors split 2-2 between
        # labels 3 and 7 -> tie broken toward label 3
        rows = [(0, [0.0] * 8, 9)]
        for i, lab in [(1, 3), (2, 3), (3, 7), (4, 7)]:
            rows.append((i, [0.1 * i] * 8, lab))
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )
        out = knn_classify(
            df, "vec_id", "embedding", "label", dims=8, k=4
        ).collect()
        assert len(out) == 1
        assert out[0]["pred"] == 3
        assert out[0]["votes"] == 2
