"""Fisher's linear discriminant, closed form, one scan.

Reference surface: the reference wraps sklearn discriminant estimators
in its model-search layer (gofast/models — estimator dispatch); the
two-class two-feature LDA has a closed form that needs only per-class
first and second moments, so on a distributed engine it is ONE
groupBy-free conditional aggregate:

    w  = S_w^{-1} (mu_1 - mu_0)          (Fisher, Ann. Eugenics 1936)
    c  = w' (mu_0 + mu_1) / 2            (midpoint threshold)

with S_w the pooled within-class scatter.  Engine-reproducibility:
per-row values and products are quantized to micro-units and summed as
compact decimals (the repo's exact-money discipline — the sums stay
exact to ~1e28, far above a 100-TB row count), so every downstream
double — means, scatters, the 2x2 inverse, w, c — is the same fixed
expression tree over identical integers in any engine."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fisher_lda_binary(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    unit: int = 1_000_000,
) -> DataFrame:
    """Two-class, two-feature Fisher LDA in one aggregate.

    ``label_col`` must be 0/1 (int).  Returns ONE row:
    ``(n0, n1, w1, w2, threshold)`` where ``w`` solves
    ``S_w w = mu_1 - mu_0`` by the closed 2x2 inverse in fixed
    expression order and ``threshold = w'(mu_0 + mu_1)/2`` — classify
    ``x`` as class 1 when ``w'x > threshold``."""
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("fisher_lda_binary supports exactly 2 features")
    y = F.col(label_col).cast("int")
    x1 = F.col(feats[0]).cast("double")
    x2 = F.col(feats[1]).cast("double")
    cond = y.isNotNull() & x1.isNotNull() & x2.isNotNull()

    def q(x):
        # micro-unit row quantization summed as compact decimal:
        # exact integer moments at any scale.  floor(), not a bare
        # bigint cast: the cast truncates toward zero, which diverges
        # from the floor-based oracle replay on NEGATIVE values
        return (
            F.floor(x * F.lit(float(unit)) + F.lit(0.5))
            .cast("bigint")
            .cast("decimal(18,0)")
        )

    aggs = []
    for c in (0, 1):
        m = (y == c).cast("int")
        aggs += [
            F.sum(m).cast("bigint").alias(f"n{c}"),
            F.sum(m * q(x1)).alias(f"s1_{c}"),
            F.sum(m * q(x2)).alias(f"s2_{c}"),
            F.sum(m * q(x1 * x1)).alias(f"s11_{c}"),
            F.sum(m * q(x1 * x2)).alias(f"s12_{c}"),
            F.sum(m * q(x2 * x2)).alias(f"s22_{c}"),
        ]
    mo = df.where(cond).agg(*aggs)
    u = F.lit(float(unit))

    def mean(i, c):
        return F.col(f"s{i}_{c}").cast("double") / u / F.col(
            f"n{c}"
        ).cast("double")

    def scatter(ij, c):
        i, j = ij
        return F.col(f"s{i}{j}_{c}").cast("double") / u - F.col(
            f"n{c}"
        ).cast("double") * mean(i, c) * mean(j, c)

    a = scatter("11", 0) + scatter("11", 1)
    b = scatter("12", 0) + scatter("12", 1)
    d = scatter("22", 0) + scatter("22", 1)
    det = a * d - b * b
    d1 = mean(1, 1) - mean(1, 0)
    d2 = mean(2, 1) - mean(2, 0)
    w1 = (d * d1 - b * d2) / det
    w2 = (a * d2 - b * d1) / det
    thr = (
        w1 * (mean(1, 0) + mean(1, 1)) + w2 * (mean(2, 0) + mean(2, 1))
    ) / F.lit(2.0)
    return mo.select(
        "n0",
        "n1",
        w1.alias("w1"),
        w2.alias("w2"),
        thr.alias("threshold"),
    )
