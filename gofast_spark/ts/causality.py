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


def engle_granger(
    df: DataFrame,
    order_col: str,
    y_col: str,
    x_col: str,
    *,
    units: float = 1e4,
) -> DataFrame:
    """Engle-Granger two-step cointegration test (Engle & Granger,
    Econometrica 1987), lag-0 ADF form: (1) OLS ``y ~ a + b x`` from
    exact integer moments; (2) regress the residual's first difference
    on its own lag (no intercept) and report the t-statistic of

        gamma = sum(e_{t-1} * de_t) / sum(e_{t-1}^2)

    — a strongly negative t rejects 'no cointegration' against the
    Engle-Granger critical values (~-3.34 at 5%, n=50).  Residuals are
    exact-moment-derived doubles quantized to ``units`` integers, so
    both stages are bit-reproducible.  Shapes: one moment aggregate, a
    broadcast, one lag window over the rollup series, one final
    aggregate.  Output: ``(alpha, beta, gamma, t_stat, n)``."""
    yu = F.floor(F.col(y_col).cast("double") * F.lit(units)
                 + F.lit(0.5)).cast("bigint")
    xu = F.floor(F.col(x_col).cast("double") * F.lit(units)
                 + F.lit(0.5)).cast("bigint")
    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(order_col).alias("__o"), xu.alias("__x"),
             yu.alias("__y"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(dec("__x")).alias("__sx"),
        F.sum(dec("__y")).alias("__sy"),
        F.sum(dec("__x") * F.col("__x")).alias("__sxx"),
        F.sum(dec("__x") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("__n").cast("decimal(19,0)")
    b = (
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
        .cast("double")
        / (n * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        .cast("double")
    )
    a_u = (
        F.col("__sy").cast("double") / F.col("__n").cast("double")
        - b * (F.col("__sx").cast("double")
               / F.col("__n").cast("double"))
    )
    fit = m.select("__n", b.alias("__b"), a_u.alias("__a_u"))
    res = base.crossJoin(F.broadcast(fit)).select(
        "__o",
        F.floor(
            F.col("__y").cast("double") - F.col("__a_u")
            - F.col("__b") * F.col("__x").cast("double") + F.lit(0.5)
        ).cast("bigint").alias("__e"),
        F.col("__b"), (F.col("__a_u") / F.lit(units)).alias("__a"),
    )
    w = Window.orderBy("__o")
    lagd = res.select(
        "__a", "__b",
        F.lag("__e").over(w).alias("__el"),
        (F.col("__e") - F.lag("__e").over(w)).alias("__de"),
    ).where(F.col("__el").isNotNull())
    agg = lagd.agg(
        F.first("__a").alias("alpha"),
        F.first("__b").alias("beta"),
        F.count(F.lit(1)).alias("__m"),
        F.sum(dec("__el") * F.col("__el")).alias("__see"),
        F.sum(dec("__el") * F.col("__de")).alias("__sed"),
        F.sum(dec("__de") * F.col("__de")).alias("__sdd"),
    )
    g = F.col("__sed").cast("double") / F.col("__see").cast("double")
    s2 = (
        (F.col("__sdd").cast("double")
         - g * F.col("__sed").cast("double"))
        / (F.col("__m").cast("double") - F.lit(1.0))
    )
    t = g / F.sqrt(s2 / F.col("__see").cast("double"))
    return agg.select(
        "alpha", "beta", g.alias("gamma"), t.alias("t_stat"),
        F.col("__m").cast("bigint").alias("n"),
    )


def cross_correlation(
    x_df: "DataFrame",
    y_df: "DataFrame",
    date_col: str,
    value_col: str,
    *,
    max_lag: int = 3,
) -> "DataFrame":
    """Sample cross-correlation function between two integer-valued
    daily series (Box & Jenkins 1970, ch. 11 — the lead-lag screen
    that motivates the Granger test already in the catalog):

        r(lag) = corr( x_t, y_{t+lag} ),  lag in [-max_lag, max_lag]

    Relational shape: the x frame is exploded across the lag table
    (2L+1 broadcast rows), keyed to ``date + lag``, and joined to the
    y frame — every lag's Pearson moments come from ONE grouped
    aggregate over integer counts, so each r(lag) is a replayed
    expression over exact integers.  Returns one row per lag
    ``(lag, n, r)`` ordered by lag."""
    from pyspark.sql import functions as F

    spark = x_df.sparkSession
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    x = x_df.select(
        F.col(date_col).alias("d"), F.col(value_col).alias("x")
    )
    y = y_df.select(
        F.col(date_col).alias("dy"), F.col(value_col).alias("y")
    )
    keyed = x.crossJoin(F.broadcast(lags)).select(
        "lag", "x", F.date_add(F.col("d"), F.col("lag")).alias("dk")
    )
    joined = keyed.join(y, F.col("dk") == F.col("dy"))
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m = F.col("m").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    r = (m * sxy - sx * sy) / F.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    return agg.select(
        "lag", F.col("m").cast("bigint").alias("n"), r.alias("r")
    ).orderBy("lag")
