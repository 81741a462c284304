"""Closed-form stacking regressor — the reference's benchmark shape.

Mirrors ``BenchmarkRegressor`` (gofast/estimators/benchmark.py): K base
learners + a meta learner stacked on their predictions (Wolpert,
"Stacked Generalization", Neural Networks 1992; Breiman, "Stacked
Regressions", Machine Learning 1996).  Here both levels are
closed-form: two single-feature ridge bases and an OLS meta with
intercept — and because each base prediction is LINEAR in its feature,
every meta moment derives analytically from the same raw moment
aggregate the bases use:

    sum(p)    = n a + b sum(x)
    sum(p^2)  = n a^2 + 2 a b sum(x) + b^2 sum(x^2)
    sum(p q)  = n a c + a d sum(x2) + c b sum(x1) + b d sum(x1 x2)
    sum(p y)  = a sum(y) + b sum(x y)

so the ENTIRE stack — base fits, meta fit, train RMSE — costs ONE scan
and a 1-row driver solve (the repo's fit_linear_regression pattern:
exact milli-unit integer moments, fixed-order Cramer in IEEE doubles,
bit-replayable by a SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_stacking_ols(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    *,
    base_ridge: float = 1000.0,
) -> DataFrame:
    """Fit the two-base stack; returns one row ``(a1, b1, a2, b2, w0,
    w1, w2, rmse, n)`` — base intercepts/slopes, meta weights
    (intercept, base1, base2) and the training RMSE of the stacked
    prediction.  ``base_ridge`` penalizes the base slopes (never the
    intercepts) so the bases are genuinely distinct from plain OLS."""
    from gofast_spark.ml.regression import _cramer_solve

    q = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * 1e3 + F.lit(0.5)
    ).cast("bigint")
    dec = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    x1, x2, y = q(x1_col), q(x2_col), q(y_col)
    base = df.where(
        F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
        & F.col(y_col).isNotNull()
    ).select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("x1")) * F.col("x1")).alias("sx1x1"),
        F.sum(dec(F.col("x2")) * F.col("x2")).alias("sx2x2"),
        F.sum(dec(F.col("x1")) * F.col("x2")).alias("sx1x2"),
        F.sum(dec(F.col("x1")) * F.col("y")).alias("sx1y"),
        F.sum(dec(F.col("x2")) * F.col("y")).alias("sx2y"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    ).collect()[0]
    # integer milli-unit sums -> natural-unit doubles, fixed order
    n = float(m["n"])
    sx1 = float(m["sx1"]) / 1000.0
    sx2 = float(m["sx2"]) / 1000.0
    sy = float(m["sy"]) / 1000.0
    sx1x1 = float(m["sx1x1"]) / 1000000.0
    sx2x2 = float(m["sx2x2"]) / 1000000.0
    sx1x2 = float(m["sx1x2"]) / 1000000.0
    sx1y = float(m["sx1y"]) / 1000000.0
    sx2y = float(m["sx2y"]) / 1000000.0
    syy = float(m["syy"]) / 1000000.0
    lam = float(base_ridge)
    a1, b1 = _cramer_solve(
        [[n, sx1], [sx1, sx1x1 + lam]], [sy, sx1y]
    )
    a2, b2 = _cramer_solve(
        [[n, sx2], [sx2, sx2x2 + lam]], [sy, sx2y]
    )
    # analytic meta moments over p1 = a1 + b1 x1, p2 = a2 + b2 x2
    sp1 = n * a1 + b1 * sx1
    sp2 = n * a2 + b2 * sx2
    sp11 = n * a1 * a1 + 2.0 * a1 * b1 * sx1 + b1 * b1 * sx1x1
    sp22 = n * a2 * a2 + 2.0 * a2 * b2 * sx2 + b2 * b2 * sx2x2
    sp12 = (
        n * a1 * a2 + a1 * b2 * sx2 + a2 * b1 * sx1 + b1 * b2 * sx1x2
    )
    sp1y = a1 * sy + b1 * sx1y
    sp2y = a2 * sy + b2 * sx2y
    A = [[n, sp1, sp2], [sp1, sp11, sp12], [sp2, sp12, sp22]]
    bvec = [sy, sp1y, sp2y]
    w0, w1, w2 = _cramer_solve(A, bvec)
    # training SSE of the stack from the same moments:
    # yy - 2 w'b + w'Aw in fixed accumulation order
    sse = (
        syy
        - 2.0 * (w0 * bvec[0] + w1 * bvec[1] + w2 * bvec[2])
        + (
            w0 * (A[0][0] * w0 + A[0][1] * w1 + A[0][2] * w2)
            + w1 * (A[1][0] * w0 + A[1][1] * w1 + A[1][2] * w2)
            + w2 * (A[2][0] * w0 + A[2][1] * w1 + A[2][2] * w2)
        )
    )
    rmse = (sse / n) ** 0.5
    spark = df.sparkSession
    return spark.createDataFrame(
        [(a1, b1, a2, b2, w0, w1, w2, rmse, int(n))],
        "a1 double, b1 double, a2 double, b2 double, "
        "w0 double, w1 double, w2 double, rmse double, n bigint",
    )
