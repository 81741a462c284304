"""Unit tests for Dunn's test, Kendall's W, Ansari-Bradley, and the
retrieval-metrics evaluator."""

from __future__ import annotations

import numpy as np
import pytest


class TestDunnTest:
    def test_shifted_group_stands_out(self, spark):
        from gofast_spark.stats.inferential import dunn_test

        rng = np.random.RandomState(2)
        rows = (
            [("a", float(v)) for v in rng.normal(0, 1, 100)]
            + [("b", float(v)) for v in rng.normal(0, 1, 100)]
            + [("c", float(v)) for v in rng.normal(5, 1, 100)]
        )
        df = spark.createDataFrame(rows, "g string, v double")
        out = {(r["g_a"], r["g_b"]): r for r in dunn_test(df, "v", "g").collect()}
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert abs(out[("a", "b")]["z"]) < 3.0
        assert out[("a", "c")]["z"] < -5.0
        assert out[("b", "c")]["z"] < -5.0

    def test_rank_sums_exact_small_case(self, spark):
        from gofast_spark.stats.inferential import dunn_test

        # values 1..6, groups a={1,2}, b={3,4}, c={5,6}:
        # mean ranks 1.5, 3.5, 5.5
        rows = [("a", 1.0), ("a", 2.0), ("b", 3.0),
                ("b", 4.0), ("c", 5.0), ("c", 6.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {(r["g_a"], r["g_b"]): r for r in dunn_test(df, "v", "g").collect()}
        assert out[("a", "b")]["mean_rank_diff"] == -2.0
        assert out[("a", "c")]["mean_rank_diff"] == -4.0


class TestKendallW:
    def test_perfect_concordance(self, spark):
        from gofast_spark.stats.inferential import kendall_w

        rows = [
            (b, t, float(t * 10 + b))
            for b in range(1, 6)
            for t in range(1, 5)
        ]
        df = spark.createDataFrame(rows, "b int, t int, v double")
        out = kendall_w(df, "b", "t", "v").first()
        assert out["b_blocks"] == 5
        assert out["k_treatments"] == 4
        assert out["w"] == pytest.approx(1.0, abs=1e-12)

    def test_random_rankings_low_w(self, spark):
        from gofast_spark.stats.inferential import kendall_w

        rng = np.random.RandomState(4)
        rows = [
            (b, t, float(rng.uniform()))
            for b in range(1, 21)
            for t in range(1, 6)
        ]
        df = spark.createDataFrame(rows, "b int, t int, v double")
        out = kendall_w(df, "b", "t", "v").first()
        assert 0.0 <= out["w"] < 0.25


class TestAnsariBradley:
    def test_scale_difference_detected(self, spark):
        from gofast_spark.stats.inferential import ansari_bradley

        rng = np.random.RandomState(6)
        narrow = rng.normal(0, 1, 200)
        wide = rng.normal(0, 5, 200)
        rows = [("n", float(v)) for v in narrow] + [
            ("w", float(v)) for v in wide
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = ansari_bradley(df, "v", "g", "n", "w").first()
        # the narrow group sits mid-ranks: AB above its null mean
        assert out["z"] > 4.0

    def test_same_scale_near_zero(self, spark):
        from gofast_spark.stats.inferential import ansari_bradley

        rng = np.random.RandomState(8)
        rows = [("a", float(v)) for v in rng.normal(0, 2, 200)] + [
            ("b", float(v)) for v in rng.normal(0, 2, 200)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = ansari_bradley(df, "v", "g", "a", "b").first()
        assert abs(out["z"]) < 3.0


class TestRetrievalEval:
    def _clustered(self, spark, spread):
        rng = np.random.RandomState(10)
        rows = []
        for i in range(200):
            label = i % 4
            center = label * 20.0
            vec = rng.normal(center, spread, 8).tolist()
            rows.append((i, [float(x) for x in vec], label))
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )

    def test_separable_clusters_perfect_metrics(self, spark):
        from gofast_spark.ml.knn import retrieval_eval

        df = self._clustered(spark, spread=0.5)
        out = retrieval_eval(
            df, "vec_id", "embedding", "label", dims=8, k=10, p_at=5
        ).first()
        assert out["n_queries"] == 20
        assert out["precision_at_p"] == 1.0
        assert out["mrr"] == pytest.approx(1.0, abs=1e-6)
        assert out["ndcg"] == pytest.approx(1.0, abs=1e-6)

    def test_noisy_clusters_degrade(self, spark):
        from gofast_spark.ml.knn import retrieval_eval

        tight = retrieval_eval(
            self._clustered(spark, spread=0.5),
            "vec_id", "embedding", "label",
        ).first()
        noisy = retrieval_eval(
            self._clustered(spark, spread=30.0),
            "vec_id", "embedding", "label",
        ).first()
        assert noisy["precision_at_p"] < tight["precision_at_p"]
        assert noisy["ndcg"] < tight["ndcg"]
        # random-ish retrieval with 4 balanced labels: p@5 near 0.25
        assert 0.05 < noisy["precision_at_p"] < 0.6
