"""Unit tests for binned mutual information inputs, the Gaussian
Bhattacharyya distance, and closed-form 2D PCA."""

from __future__ import annotations

import math

import numpy as np
import pytest


class TestBhattacharyyaGaussian:
    def test_identical_gaussians_zero(self, spark):
        from gofast_spark.quality.drift import bhattacharyya_gaussian

        rng = np.random.RandomState(1)
        vals = rng.normal(10, 2, 400).round(4)
        rows = [("a", float(v)) for v in vals] + [
            ("b", float(v)) for v in vals
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = bhattacharyya_gaussian(df, "v", "g", "a", "b").first()
        assert out["db"] == pytest.approx(0.0, abs=1e-6)
        assert out["bc_u9"] == 1_000_000_000

    def test_known_mean_shift(self, spark):
        from gofast_spark.quality.drift import bhattacharyya_gaussian

        # equal variances s^2: DB = (mu_a - mu_b)^2 / (8 s^2)
        rng = np.random.RandomState(3)
        a = rng.normal(0, 1, 5000)
        b = rng.normal(2, 1, 5000)
        rows = [("a", float(v)) for v in a] + [
            ("b", float(v)) for v in b
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = bhattacharyya_gaussian(df, "v", "g", "a", "b").first()
        assert out["db"] == pytest.approx(4.0 / 8.0, abs=0.05)
        assert out["bc_u9"] / 1e9 == pytest.approx(
            math.exp(-out["db"]), abs=1e-6
        )


class TestPca2d:
    def test_axis_aligned_spread(self, spark):
        from gofast_spark.ml.dimensionality import pca_2d

        rng = np.random.RandomState(5)
        rows = []
        for i in range(500):
            vec = [float(rng.normal(0, 3.0)), float(rng.normal(0, 0.5))]
            rows.append((i, vec + [0.0] * 6))
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        )
        out = pca_2d(df, "embedding").first()
        assert out["n"] == 500
        assert out["lambda1"] == pytest.approx(9.0, rel=0.2)
        assert out["lambda2"] == pytest.approx(0.25, rel=0.3)
        # principal axis ~ x-axis
        assert abs(out["theta"]) < 0.1
        assert out["explained_ratio"] > 0.9

    def test_rotated_cloud_angle(self, spark):
        from gofast_spark.ml.dimensionality import pca_2d

        rng = np.random.RandomState(7)
        ang = math.pi / 6
        rows = []
        for i in range(500):
            t = rng.normal(0, 3.0)
            s = rng.normal(0, 0.3)
            xx = t * math.cos(ang) - s * math.sin(ang)
            yy = t * math.sin(ang) + s * math.cos(ang)
            rows.append((i, [float(xx), float(yy)] + [0.0] * 6))
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        )
        out = pca_2d(df, "embedding").first()
        assert out["theta"] == pytest.approx(ang, abs=0.05)
        # eigen identities: trace and determinant preserved
        tr = out["var_x"] + out["var_y"]
        assert out["lambda1"] + out["lambda2"] == pytest.approx(
            tr, rel=1e-9
        )
        det = out["var_x"] * out["var_y"] - out["cov_xy"] ** 2
        assert out["lambda1"] * out["lambda2"] == pytest.approx(
            det, rel=1e-6
        )


class TestMiBinnedInputs:
    def test_dependent_pair_higher_mi(self, spark):
        from gofast_spark.quality.drift import _bin
        from gofast_spark.stats.infotheory import entropy_report

        import pyspark.sql.functions as F

        rng = np.random.RandomState(9)
        x = rng.randint(1, 11, 2000)
        y_dep = x * 10.0 + rng.normal(0, 1, 2000)
        y_ind = rng.uniform(10, 110, 2000)

        def mi(xv, yv):
            rows = [(int(a), float(b)) for a, b in zip(xv, yv)]
            df = spark.createDataFrame(rows, "x int, yv double")
            lo, hi = float(yv.min()), float(yv.max())
            width = ((hi - lo) or 1.0) / 20
            d = df.select(
                "x", _bin(F.col("yv"), lo, width, 20).alias("y")
            )
            return entropy_report(d, "x", "y").first()["mi_u6"]

        assert mi(x, y_dep) > mi(x, y_ind) + 500_000
