"""Random-intercept mixed model: recovery of simulated effects
(reference gofast/stats/inferential.py:661)."""

from __future__ import annotations

import pytest


def _sim(spark, n_groups=40, per_group=30, beta=(2.0, 1.5), su=2.0, se=0.5):
    import numpy as np

    rng = np.random.default_rng(13)
    rows = []
    for g in range(n_groups):
        u = rng.normal(0, su)
        x = rng.normal(0, 1, per_group)
        y = beta[0] + beta[1] * x + u + rng.normal(0, se, per_group)
        rows += [(f"g{g:03d}", float(xi), float(yi)) for xi, yi in zip(x, y)]
    return spark.createDataFrame(rows, ["grp", "x", "y"])


def test_recovers_fixed_effects_and_variances(spark):
    from gofast_spark.stats import mixed_effects_model

    df = _sim(spark)
    out = {r["term"]: r["value"] for r in
           mixed_effects_model(df, "y", ["x"], "grp").collect()}
    assert out["intercept"] == pytest.approx(2.0, abs=0.8)
    assert out["x"] == pytest.approx(1.5, abs=0.1)
    # variance components: sigma2 ~ 0.25, sigma2_u ~ 4
    assert out["sigma2"] == pytest.approx(0.25, rel=0.5)
    assert out["sigma2_u"] == pytest.approx(4.0, rel=0.6)
    assert out["n_groups"] == 40.0


def test_slope_beats_pooled_ols_when_confounded(spark):
    """Group intercepts correlated with group-mean x: pooled OLS biases
    the slope, the random-intercept GLS shrinks toward the within-group
    estimate."""
    import numpy as np

    from gofast_spark.stats import mixed_effects_model

    rng = np.random.default_rng(3)
    rows = []
    for g in range(30):
        u = g * 0.5  # intercept grows with group id
        x = rng.normal(g * 0.3, 1.0, 20)  # x mean also grows -> confounding
        y = 1.0 * x + u + rng.normal(0, 0.3, 20)
        rows += [(f"g{g}", float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {r["term"]: r["value"] for r in
           mixed_effects_model(df, "y", ["x"], "grp").collect()}
    # pooled OLS slope would be ~1 + 0.5/0.3 ~ 2.0+; GLS must sit near 1
    assert out["x"] == pytest.approx(1.0, abs=0.25)


def test_random_slopes_raise(spark):
    from gofast_spark.stats import mixed_effects_model

    df = spark.createDataFrame([("a", 1.0, 1.0)], ["g", "x", "y"])
    with pytest.raises(NotImplementedError):
        mixed_effects_model(df, "y", ["x"], "g", re_formula="~x")
