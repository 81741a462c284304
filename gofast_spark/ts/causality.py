"""Granger causality test between two aligned series.

Public basis: Granger (Econometrica 1969); the standard F-test form —
regress ``y_t`` on its own lag with and without the lagged ``x``, and
compare residual sums of squares:

    F = ((SSE_r - SSE_u) / p) / (SSE_u / (n - 2p - 1)),   p = 1 here.

Spark shape: the series frame is rollup-sized (e.g. daily aggregates),
so after the one data-sized groupBy that builds it, everything is a
lag window over <= a few thousand rows plus ONE moment aggregate.
Series values are quantized to exact integers (``scale``; use 1 for
count series), so every Gram moment is an exact int64 sum and the
closed-form Cramer solve — and with it SSE and the F statistic — is
bit-identical across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["granger_causality"]


def granger_causality(
    df: DataFrame,
    order_col: str,
    x_col: str,
    y_col: str,
    *,
    scale: float = 1.0,
) -> DataFrame:
    """Does lagged ``x`` improve the one-lag autoregression of ``y``?

    Lag order is fixed at p=1 (the closed-form 3x3 Cramer solve; higher
    orders would need an iterative solver — out of the oracle-exact
    envelope).  Returns ONE row: ``(n, sse_r, sse_u, f_stat)`` where
    ``n`` is the usable row count (series length - 1), ``sse_r`` /
    ``sse_u`` the restricted / unrestricted residual sums of squares in
    quantized units, and ``f_stat`` the Granger F statistic with
    (1, n - 3) degrees of freedom.

    Values are multiplied by ``scale`` and truncated to integers
    before any sum — pass ``scale=1`` for integer series (counts) and
    ``1e6`` for micro-unit quantization of float series.
    """
    w = Window.orderBy("__o")
    q = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * F.lit(scale) + F.lit(0.5)
    ).cast("bigint")
    base = df.select(
        F.col(order_col).alias("__o"), q(x_col).alias("__x"), q(y_col).alias("__y")
    )
    lagged = base.select(
        F.col("__y").alias("y"),
        F.lag("__y").over(w).alias("l"),
        F.lag("__x").over(w).alias("x"),
    ).where(F.col("l").isNotNull() & F.col("x").isNotNull())
    m = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("l").alias("sl"),
        F.sum("x").alias("sx"),
        F.sum(F.col("y") * F.col("l")).alias("syl"),
        F.sum(F.col("y") * F.col("x")).alias("syx"),
        F.sum(F.col("l") * F.col("x")).alias("slx"),
        F.sum(F.col("l") * F.col("l")).alias("sll"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sy, sl, sx = (F.col(c).cast("double") for c in ("sy", "sl", "sx"))
    syl, syx, slx = (F.col(c).cast("double") for c in ("syl", "syx", "slx"))
    sll, sxx, syy = (F.col(c).cast("double") for c in ("sll", "sxx", "syy"))
    # unrestricted [c, a, b] via Cramer on [[n,sl,sx],[sl,sll,slx],[sx,slx,sxx]]
    det = (
        n * (sll * sxx - slx * slx)
        - sl * (sl * sxx - slx * sx)
        + sx * (sl * slx - sll * sx)
    )
    dc = (
        sy * (sll * sxx - slx * slx)
        - sl * (syl * sxx - slx * syx)
        + sx * (syl * slx - sll * syx)
    )
    da = (
        n * (syl * sxx - slx * syx)
        - sy * (sl * sxx - slx * sx)
        + sx * (sl * syx - syl * sx)
    )
    db = (
        n * (sll * syx - syl * slx)
        - sl * (sl * syx - syl * sx)
        + sy * (sl * slx - sll * sx)
    )
    cu = dc / det
    au = da / det
    bu = db / det
    sse_u = syy - (cu * sy + au * syl + bu * syx)
    # restricted y_t = c + a * y_{t-1}
    ar = (n * syl - sl * sy) / (n * sll - sl * sl)
    cr = (sy - ar * sl) / n
    sse_r = syy - cr * sy - ar * syl
    f = (sse_r - sse_u) / (sse_u / (n - F.lit(3.0)))
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        sse_r.alias("sse_r"),
        sse_u.alias("sse_u"),
        f.alias("f_stat"),
    )
