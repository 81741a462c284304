"""Time-series feature engineering, stationarity transforms, trend, ACF.

Reference: ``ts_engineering`` (gofast/utils/ts_utils.py:2482),
``transform_stationarity`` (:3262), ``trend_analysis`` (:720),
``ts_corr_analysis`` ACF (:2913), ``FourierFeaturesTransformer``
(gofast/transformers/ts.py:29).

Scale shape: lags/rolling are windows over ``partition_by`` (bounded state
per series); trend and ACF collapse to covariance/correlation aggregates —
single map-side-combined jobs, no sorts of the raw data beyond the
per-series window sort.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(order_by, partition_by):
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    parts = (
        []
        if partition_by is None
        else ([partition_by] if isinstance(partition_by, str) else list(partition_by))
    )
    return Window.partitionBy(*parts).orderBy(*[F.col(c) for c in order])


def ts_engineering(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    partition_by: str | None = None,
    lags: Sequence[int] = (1, 7),
    roll_windows: Sequence[int] = (7,),
    diff: bool = True,
    fourier_k: int = 0,
    fourier_period: float = 365.0,
    time_index_col: str | None = None,
) -> DataFrame:
    """Lags + rolling mean/std + diff + Fourier terms in one pass
    (gofast/utils/ts_utils.py:2482).

    Everything lands in a single projection over one window family (same
    partitioning/ordering), so Catalyst evaluates it in one Window node.
    Fourier terms need ``time_index_col`` (a numeric position, e.g. day
    number): ``sin/cos(2*pi*k*t/period)``.
    """
    w = _w(order_by, partition_by)
    out = df
    v = F.col(value_col)
    for k in lags:
        out = out.withColumn(f"{value_col}_lag_{k}", F.lag(v, k).over(w))
    for n in roll_windows:
        rw = w.rowsBetween(-(n - 1), 0)
        out = out.withColumn(f"{value_col}_rollmean_{n}", F.avg(v).over(rw))
        out = out.withColumn(f"{value_col}_rollstd_{n}", F.stddev_samp(v).over(rw))
    if diff:
        out = out.withColumn(f"{value_col}_diff", v - F.lag(v, 1).over(w))
    if fourier_k:
        if time_index_col is None:
            raise ValueError("fourier terms need time_index_col")
        t = F.col(time_index_col)
        for k in range(1, fourier_k + 1):
            ang = 2.0 * math.pi * k * t / F.lit(float(fourier_period))
            out = out.withColumn(f"fourier_sin_{k}", F.sin(ang))
            out = out.withColumn(f"fourier_cos_{k}", F.cos(ang))
    return out


def transform_stationarity(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    method: str = "diff",
    periods: int = 1,
    partition_by: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Differencing / log / linear detrend (gofast/utils/ts_utils.py:3262)."""
    oc = out_col or f"{value_col}_stat"
    v = F.col(value_col)
    if method == "diff":
        w = _w(order_by, partition_by)
        return df.withColumn(oc, v - F.lag(v, periods).over(w))
    if method == "log":
        return df.withColumn(oc, F.log(v))
    if method == "detrend":
        return detrend(
            df, value_col, order_by, partition_by=partition_by, out_col=oc
        )
    raise ValueError(f"unsupported method {method!r}")


def trend_analysis(
    df: DataFrame,
    value_col: str,
    time_index_col: str,
) -> DataFrame:
    """Global OLS trend: slope/intercept/r2 in ONE aggregation
    (gofast/utils/ts_utils.py:720's linear part — ADF/KPSS are per-series
    scipy fits, out of scope here).

    slope = cov(t, v) / var(t); intercept = mean(v) - slope * mean(t);
    r2 = corr(t, v)^2 — covariance/corr are map-side-combinable aggregates,
    so this costs one reduce regardless of data size.
    """
    t, v = F.col(time_index_col), F.col(value_col)
    slope = F.covar_samp(t, v) / F.var_samp(t)
    return df.agg(
        slope.alias("slope"),
        (F.avg(v) - slope * F.avg(t)).alias("intercept"),
        F.pow(F.corr(t, v), 2).alias("r2"),
        F.count(v).alias("n"),
    )


def detrend(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    partition_by: str | None = None,
    time_index_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Remove the OLS linear trend: v - (intercept + slope * t).

    Two-pass Estimator: the slope/intercept aggregate is one reduced row
    (driver literals), the subtraction is a lazy projection.  Without an
    explicit ``time_index_col`` the row position within the ordering is
    used (window row_number — per-series with ``partition_by``).
    """
    oc = out_col or f"{value_col}_detrended"
    out = df
    tcol = time_index_col
    if tcol is None:
        tcol = "__t_idx"
        out = out.withColumn(
            tcol, F.row_number().over(_w(order_by, partition_by)).cast("double")
        )
    fit = trend_analysis(out, value_col, tcol).first()
    slope, intercept = fit["slope"], fit["intercept"]
    out = out.withColumn(
        oc, F.col(value_col) - (F.lit(intercept) + F.lit(slope) * F.col(tcol))
    )
    return out.drop("__t_idx") if time_index_col is None else out


def ccf(
    df: DataFrame,
    value_col: str,
    feature_col: str,
    order_by: str,
    *,
    lags: Sequence[int] = (0, 1, 2),
    partition_by: str | None = None,
) -> DataFrame:
    """Cross-correlation of the target with lagged features:
    corr(v, lag(u, k)) per k (ts_corr_analysis cross-corr half,
    gofast/utils/ts_utils.py:2913)."""
    w = _w(order_by, partition_by)
    out = df.select(
        F.col(value_col).alias("__v"),
        *[F.lag(feature_col, k).over(w).alias(f"__u_{k}") for k in lags],
    )
    return out.agg(
        *[F.corr("__v", f"__u_{k}").alias(f"ccf_{k}") for k in lags]
    )


def acf(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    lags: Sequence[int] = (1, 2, 3),
    partition_by: str | None = None,
) -> DataFrame:
    """Autocorrelation at each lag k: corr(v, lag(v, k))
    (gofast/utils/ts_utils.py:2913's ACF; PACF needs a per-series solve —
    out of scope).  One window projection + one aggregate row."""
    w = _w(order_by, partition_by)
    out = df.select(
        F.col(value_col).alias("__v"),
        *[F.lag(value_col, k).over(w).alias(f"__l_{k}") for k in lags],
    )
    return out.agg(
        *[F.corr("__v", f"__l_{k}").alias(f"acf_{k}") for k in lags]
    )


def _durbin_frame(acf_row: DataFrame, max_lag: int) -> DataFrame:
    """Unroll the Durbin-Levinson recursion over a one-row ACF frame as
    chained projections, yielding every ``__phi_{k}_{j}`` coefficient
    column (k = recursion level, j = lag).  Shared by :func:`pacf_frame`
    (diagonal ``phi_kk``) and :func:`ar_forecast` (final row
    ``phi_{p,1..p}`` = the Yule-Walker AR(p) coefficients)."""

    def rho(i: int):
        return F.lit(1.0) if i == 0 else F.col(f"acf_{i}")

    out = acf_row.select("*", F.col("acf_1").alias("__phi_1_1"))
    for k in range(2, max_lag + 1):
        prev = {j: F.col(f"__phi_{k-1}_{j}") for j in range(1, k)}
        num = rho(k) - sum(
            (prev[j] * rho(k - j) for j in range(1, k)), F.lit(0.0)
        )
        den = F.lit(1.0) - sum(
            (prev[j] * rho(j) for j in range(1, k)), F.lit(0.0)
        )
        out = out.select("*", (num / den).alias(f"__phi_{k}_{k}"))
        a = F.col(f"__phi_{k}_{k}")
        out = out.select(
            "*",
            *[
                (prev[j] - a * prev[k - j]).alias(f"__phi_{k}_{j}")
                for j in range(1, k)
            ],
        )
    return out


def pacf_frame(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    max_lag: int = 5,
    partition_by: str | None = None,
) -> DataFrame:
    """Partial autocorrelations ``pacf_1..pacf_max_lag`` as ONE lazy
    plan: the distributed ACF aggregate (corr-with-lag, one row) feeds
    an unrolled Durbin-Levinson recursion expressed as chained
    projections over that row — lag-sized state, no driver collect, so
    PACF composes into larger plans like any other aggregate
    (ts_corr_analysis PACF half, gofast/utils/ts_utils.py:2913; the
    same unroll-the-iteration pattern as the gradient-descent entry).

    Two projections per level keep every phi a *named* column, so the
    expression tree stays O(max_lag^2) instead of copying subtrees
    exponentially."""
    out = _durbin_frame(
        acf(
            df,
            value_col,
            order_by,
            lags=tuple(range(1, max_lag + 1)),
            partition_by=partition_by,
        ),
        max_lag,
    )
    return out.select(
        *[
            F.col(f"__phi_{k}_{k}").alias(f"pacf_{k}")
            for k in range(1, max_lag + 1)
        ]
    )


def pacf(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    max_lag: int = 5,
) -> "list[float]":
    """Partial autocorrelations via Durbin-Levinson on the distributed
    ACF (ts_corr_analysis PACF half, gofast/utils/ts_utils.py:2913).

    Convenience driver-side form of :func:`pacf_frame` — collects the
    one PACF row and returns ``[pacf_1 .. pacf_max_lag]``.
    """
    row = pacf_frame(df, value_col, order_by, max_lag=max_lag).first()
    return [row[f"pacf_{k}"] for k in range(1, max_lag + 1)]


def durbin_levinson(rho: "list[float]") -> "list[float]":
    """PACF from an autocorrelation sequence ``rho`` (rho[0] == 1) via the
    Durbin-Levinson recursion; returns [phi_11, phi_22, ...]."""
    max_lag = len(rho) - 1
    phi = [[0.0] * (max_lag + 1) for _ in range(max_lag + 1)]
    out = []
    for k in range(1, max_lag + 1):
        if k == 1:
            phi[1][1] = rho[1]
        else:
            num = rho[k] - sum(phi[k - 1][j] * rho[k - j] for j in range(1, k))
            den = 1.0 - sum(phi[k - 1][j] * rho[j] for j in range(1, k))
            phi[k][k] = num / den
            for j in range(1, k):
                phi[k][j] = phi[k - 1][j] - phi[k][k] * phi[k - 1][k - j]
        out.append(phi[k][k])
    return out


def ewma(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
    partition_by: "str | None" = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average with the standard
    ``s_1 = x_1; s_t = alpha*x_t + (1-alpha)*s_{t-1}`` recursion,
    computed WITHOUT recursion: the closed form

        s_t = r^t * (alpha * (S_t - c_1) + c_1),
        c_i = x_i * r^{-i},  S_t = sum_{i<=t} c_i,  r = 1 - alpha

    needs one ``row_number`` + one cumulative window — no UDF, no
    driver loop (public identity; e.g. Hunter, "The Exponentially
    Weighted Moving Average", JQT 1986).  Intended for rollup-sized
    series (daily aggregates): the ``r^{-i}`` scaling bounds usable
    series length (~1000 points at alpha=0.5 before double overflow);
    ``partition_by`` distributes independent series across keys.
    With dyadic ``alpha`` (0.5, 0.25) every coefficient is a power of
    two, so the arithmetic is engine-exact."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    r = 1.0 - alpha
    if r == 0.0:
        return df.withColumn(out_col, F.col(value_col).cast("double"))
    part = [partition_by] if partition_by else []
    w = Window.partitionBy(*part).orderBy(order_col)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    rn = F.row_number().over(w).cast("double")
    x = F.col(value_col).cast("double")
    out = (
        df.withColumn("__rn", rn)
        .withColumn("__c", x * F.pow(F.lit(r), -F.col("__rn")))
        .withColumn("__s", F.sum("__c").over(wc))
        .withColumn("__c1", F.first("__c").over(wc))
    )
    s = F.pow(F.lit(r), F.col("__rn")) * (
        F.lit(alpha) * (F.col("__s") - F.col("__c1")) + F.col("__c1")
    )
    return out.withColumn(out_col, s).drop("__rn", "__c", "__s", "__c1")


def mann_kendall(
    df: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Kendall trend test with Sen's slope (Mann, Econometrica
    1945; Kendall 1975; Sen, JASA 1968; Theil 1950): the standard
    nonparametric monotone-trend readout for rollup series.

        S = sum over i<j of sign(x_j - x_i)
        Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18   (tie-corrected)
        z = (S -/+ 1) / sqrt(Var(S)),  sen = median pairwise slope

    Intended for ROLLUP-sized series (daily aggregates): the pair
    enumeration is a banded self-join over the series frame (the
    adaptive_moving_average shape), quadratic in the number of days —
    never in raw rows.  S and the tie term stay exact integers; the
    only float reductions are the percentile (order-free) and the final
    scalar algebra.  Returns one row ``(s, var_s, z, sen_slope, n)``."""
    w = Window.orderBy(order_col)
    idx = df.select(
        F.row_number().over(w).alias("rn"),
        F.col(value_col).cast("double").alias("x"),
    )
    a, b = idx.alias("a"), idx.alias("b")
    pairs = a.join(b, F.col("a.rn") < F.col("b.rn")).select(
        F.signum(F.col("b.x") - F.col("a.x")).cast("long").alias("sg"),
        (
            (F.col("b.x") - F.col("a.x"))
            / (F.col("b.rn") - F.col("a.rn")).cast("double")
        ).alias("slope"),
    )
    s_frame = pairs.agg(
        F.sum("sg").alias("s"),
        F.percentile("slope", F.lit(0.5)).alias("sen_slope"),
    )
    ties = (
        idx.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum(F.lit(1) * F.col("t")).alias("n"),
        )
    )
    j = s_frame.crossJoin(F.broadcast(ties))
    n = F.col("n").cast("double")
    var_s = (
        n * (n - F.lit(1.0)) * (F.lit(2.0) * n + F.lit(5.0))
        - F.col("tie_term").cast("double")
    ) / F.lit(18.0)
    s = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, (s - F.lit(1.0)) / F.sqrt(var_s))
        .when(F.col("s") < 0, (s + F.lit(1.0)) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("s"),
        var_s.alias("var_s"),
        z.alias("z"),
        F.col("sen_slope"),
        F.col("n"),
    )


def double_ewma(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Brown's double (linear) exponential smoothing (Brown 1959;
    Gardner, "Exponential smoothing: the state of the art", J.
    Forecasting 1985): ``s1 = ewma(y)``, ``s2 = ewma(s1)``, level
    ``a = 2*s1 - s2``, trend ``b = alpha/(1-alpha) * (s1 - s2)`` —
    the h-step forecast is ``a + h*b``.

    The first pass reuses :func:`ewma`'s r^{-i} scaled-sum closed form
    (engine-exact for dyadic alpha).  The second pass CANNOT reuse it
    deterministically — its inputs are non-integer doubles, and an
    unordered float sum would depend on partition order — so it
    expands the series-sized banded self-join ``(t, i <= t)`` with
    each term quantized to exact integer micro-units before summing
    (the repo's deterministic-sum discipline; quantization error is
    <= 0.5e-6 per term).  Intended for rollup-sized series (daily
    aggregates): the pair grid is ``len(series)**2`` cells,
    independent of raw row count.

    Returns one row per input row: ``(order, value, s1, s2, level,
    trend)``.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    r = 1.0 - alpha
    p1 = ewma(df, order_col, value_col, alpha=alpha, out_col="__s1")
    p1 = p1.withColumn(
        "__rn", F.row_number().over(Window.orderBy(order_col))
    )
    t = p1.select(
        F.col("__rn").alias("__t"),
        F.col(order_col),
        F.col(value_col),
        F.col("__s1"),
    )
    i = p1.select(F.col("__rn").alias("__i"), F.col("__s1").alias("__s1_i"))
    weight = F.when(
        F.col("__i") == 1, F.pow(F.lit(r), F.col("__t") - 1)
    ).otherwise(F.lit(alpha) * F.pow(F.lit(r), F.col("__t") - F.col("__i")))
    terms = t.join(i, F.col("__i") <= F.col("__t")).select(
        "__t",
        order_col,
        value_col,
        "__s1",
        F.floor(weight * F.col("__s1_i") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("__u"),
    )
    out = terms.groupBy("__t", order_col, value_col, "__s1").agg(
        (F.sum("__u") / F.lit(1e6)).alias("__s2")
    )
    k = F.lit(alpha / r)
    return out.select(
        order_col,
        value_col,
        F.col("__s1").alias("s1"),
        F.col("__s2").alias("s2"),
        (F.lit(2.0) * F.col("__s1") - F.col("__s2")).alias("level"),
        (k * (F.col("__s1") - F.col("__s2"))).alias("trend"),
    )


def brown_forecast(
    smoothed: DataFrame,
    order_col: str,
    *,
    horizon: int = 7,
) -> DataFrame:
    """h-step-ahead forecasts from the LAST row of a
    :func:`double_ewma` frame: ``yhat_h = level + h * trend`` for
    ``h = 1..horizon``.  The final state is picked in-plan with one
    ``max_by`` aggregate (no orderBy-limit global sort) and the
    horizon rows come from one ``sequence`` explode — fully lazy,
    constant-sized."""
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    last = smoothed.agg(
        F.max_by(
            F.struct(
                F.col("level").alias("level"), F.col("trend").alias("trend")
            ),
            F.col(order_col),
        ).alias("st")
    ).select(F.col("st.level").alias("level"), F.col("st.trend").alias("trend"))
    hs = last.select(
        "level",
        "trend",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(horizon)))
        ).alias("h"),
    )
    return hs.select(
        "h",
        (F.col("level") + F.col("h").cast("double") * F.col("trend")).alias(
            "forecast"
        ),
    )


def ar_forecast(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    p: int = 3,
    horizon: int = 5,
) -> DataFrame:
    """Mean-adjusted AR(p) forecast via Yule-Walker (Box & Jenkins
    1970, ch. 3; Brockwell & Davis 1991 §8.1): the AR coefficients are
    the FINAL row ``phi_{p,1..p}`` of the Durbin-Levinson recursion
    over the distributed ACF — the same unrolled in-plan chain as
    :func:`pacf_frame` — and the h-step forecast recursion

        xhat_{T+h} = mu + sum_j phi_j (x*_{T+h-j} - mu)

    (forecasts substitute for unobserved values) is unrolled as
    ``horizon`` chained projections over that one-row state.  No
    driver collect anywhere: last-p observed values come from ONE
    ``max_by`` aggregate, the mean from one aggregate, both broadcast
    onto the coefficient row.  Intended for rollup-sized series.

    Returns ``horizon`` rows ``(h, forecast)``.
    """
    if p < 1:
        raise ValueError("p must be >= 1")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    phis = _durbin_frame(
        acf(df, value_col, order_by, lags=tuple(range(1, p + 1))), p
    ).select(
        *[F.col(f"__phi_{p}_{j}").alias(f"__ph_{j}") for j in range(1, p + 1)]
    )
    w = Window.orderBy(order_by)
    lagged = df.select(
        F.col(order_by).alias("__o"),
        F.col(value_col).cast("double").alias("__v0"),
        *[
            F.lag(value_col, j).over(w).cast("double").alias(f"__v{j}")
            for j in range(1, p)
        ],
    )
    last = lagged.agg(
        F.max_by(
            F.struct(*[F.col(f"__v{j}") for j in range(p)]), F.col("__o")
        ).alias("st")
    ).select(*[F.col(f"st.__v{j}").alias(f"__v{j}") for j in range(p)])
    mu = df.agg(F.avg(F.col(value_col).cast("double")).alias("__mu"))
    st = phis.crossJoin(F.broadcast(last)).crossJoin(F.broadcast(mu))
    st = st.select(
        "*",
        *[
            (F.col(f"__v{j}") - F.col("__mu")).alias(f"__e{j}")
            for j in range(p)
        ],
    )
    devs = [f"__e{j}" for j in range(p)]  # newest first
    for h in range(1, horizon + 1):
        expr = sum(
            (
                F.col(f"__ph_{j}") * F.col(devs[j - 1])
                for j in range(1, p + 1)
            ),
            F.lit(0.0),
        )
        st = st.select("*", expr.alias(f"__d{h}"))
        devs = [f"__d{h}"] + devs[:-1]
    arr = F.array(
        *[
            F.struct(
                F.lit(h).cast("bigint").alias("h"),
                (F.col("__mu") + F.col(f"__d{h}")).alias("forecast"),
            )
            for h in range(1, horizon + 1)
        ]
    )
    return st.select(F.explode(arr).alias("s")).select(
        F.col("s.h").alias("h"), F.col("s.forecast").alias("forecast")
    )


def croston_forecast(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Croston's method for intermittent demand (Croston, Oper. Res.
    Q. 1972): maintain TWO exponential smoothers over the NONZERO
    -demand periods only — demand size ``z`` and inter-demand interval
    ``p`` — and forecast the per-period rate ``z / p``.

    Both smoothers ride :func:`ewma`'s closed form over the filtered
    nonzero frame (engine-exact for dyadic ``alpha``); the interval
    series is the gap between consecutive nonzero periods (one lag
    window).  Returns the nonzero-period frame with ``z_hat``,
    ``p_hat`` and ``croston_rate`` columns — the final row's rate is
    the standing forecast."""
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    d = df.where(
        F.col(value_col).isNotNull() & (F.col(value_col) != 0)
    ).select(F.col(order_col).alias("__o"), F.col(value_col).alias("__z"))
    w = Window.orderBy("__o")
    gaps = d.select(
        "__o",
        "__z",
        F.coalesce(
            F.col("__o") - F.lag("__o").over(w), F.lit(1)
        ).alias("__gap"),
    )
    sm = ewma(gaps, "__o", "__z", alpha=alpha, out_col="z_hat")
    sm = ewma(sm, "__o", "__gap", alpha=alpha, out_col="p_hat")
    return sm.select(
        F.col("__o").alias(order_col),
        F.col("__z").alias(value_col),
        F.col("__gap").alias("interval"),
        "z_hat",
        "p_hat",
        (F.col("z_hat") / F.col("p_hat")).alias("croston_rate"),
    )


def ljung_box(
    df: DataFrame,
    value_col: str,
    order_by: str,
    *,
    max_lag: int = 5,
) -> DataFrame:
    """Ljung-Box portmanteau statistic for serial correlation (Ljung &
    Box, Biometrika 1978): ``Q = n(n+2) * sum_k rho_k^2 / (n-k)`` with
    ``dof = max_lag``, the standard residual-whiteness diagnostic
    (gofast/utils/ts_utils.py ACF readouts stop at rho; this composes
    them).  ``rho_k`` here is :func:`acf`'s corr-with-lag estimate, so
    the whole readout is ONE window projection + ONE aggregate row over
    a rollup-sized series."""
    w = Window.orderBy(order_by)
    out = df.select(
        F.col(value_col).alias("__v"),
        *[
            F.lag(value_col, k).over(w).alias(f"__l_{k}")
            for k in range(1, max_lag + 1)
        ],
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.corr("__v", f"__l_{k}").alias(f"__r_{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    n = F.col("__n").cast("double")
    q = sum(
        (
            F.col(f"__r_{k}") * F.col(f"__r_{k}") / (n - F.lit(float(k)))
            for k in range(1, max_lag + 1)
        ),
        F.lit(0.0),
    ) * n * (n + F.lit(2.0))
    return out.select(
        q.alias("q_stat"),
        F.lit(max_lag).cast("int").alias("dof"),
        F.col("__n").cast("bigint").alias("n"),
    )


def theta_forecast(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
    horizon: int = 7,
    units: float = 1e4,
) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos, IJF 2000)
    in the Hyndman & Billah (IJF 2003) SES-with-drift form:

        yhat(h) = level + (b/2) * (h - 1 + 1/alpha - (1-alpha)^n/alpha)

    where ``level`` is the final simple-exponential-smoothing state
    (:func:`ewma`, engine-exact for dyadic ``alpha``) and ``b`` the OLS
    slope of the linear trend.  The slope comes from EXACT integer
    moments — values quantized to ``units`` (daily rollups are already
    4-decimal), sums widened to decimal — so the whole forecast is
    bit-reproducible across partitionings and engines.  One window
    projection + one aggregate; returns ``(h, forecast)`` rows."""
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    t = F.col(order_col).cast("bigint")
    vu = F.floor(F.col(value_col).cast("double") * F.lit(units) + F.lit(0.5)) \
        .cast("bigint")
    sm = ewma(df, order_col, value_col, alpha=alpha, out_col="__lvl")
    agg = sm.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(t).alias("__st"),
        F.sum(t.cast("decimal(19,0)") * t).alias("__stt"),
        F.sum(vu.cast("decimal(19,0)")).alias("__sv"),
        F.sum(t.cast("decimal(19,0)") * vu).alias("__stv"),
        F.max_by("__lvl", order_col).alias("__level"),
    )
    n = F.col("__n").cast("decimal(19,0)")
    num = (n * F.col("__stv") - F.col("__st").cast("decimal(19,0)")
           * F.col("__sv")).cast("double")
    den = (n * F.col("__stt")
           - F.col("__st").cast("decimal(19,0)")
           * F.col("__st").cast("decimal(19,0)")).cast("double")
    slope = num / den / F.lit(units)
    r = 1.0 - alpha
    drift = (
        F.col("h").cast("double") - F.lit(1.0) + F.lit(1.0 / alpha)
        - F.pow(F.lit(r), F.col("__n").cast("double")) / F.lit(alpha)
    )
    hs = agg.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h")
    )
    return hs.select(
        F.col("h").cast("int").alias("h"),
        (F.col("__level") + slope / F.lit(2.0) * drift).alias("forecast"),
    )


_TWO_PI = 6.283185307179586


def periodogram(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    max_freq: int = 10,
    units: float = 1e3,
) -> DataFrame:
    """Schuster periodogram at harmonics ``k = 1..max_freq`` (Schuster
    1898; the classical hidden-periodicity scan):

        P_k = ( C_k^2 + S_k^2 ) / n,
        C_k = sum_t v_t cos(2 pi k t / n),  S_k likewise with sin

    Intended for rollup-sized series.  Each cos/sin summand is
    quantized to ``units`` integers so the 2*max_freq reductions are
    exact (partition-order-free); the angles use a pinned 2-pi literal
    so both engines evaluate identical doubles.  One count broadcast +
    ONE aggregate + an in-plan explode to ``(k, power)`` rows."""
    t = F.col(order_col).cast("double")
    v = F.col(value_col).cast("double")
    nn = df.agg(F.count(F.lit(1)).alias("__n"))
    base = df.crossJoin(F.broadcast(nn)).select(
        t.alias("__t"), v.alias("__v"),
        F.col("__n").cast("double").alias("__nd"), "__n",
    )

    def q(expr):
        return F.floor(expr * F.lit(units) + F.lit(0.5)).cast("bigint")

    aggs = [F.first("__n").alias("__n")]
    for k in range(1, max_freq + 1):
        ang = F.lit(_TWO_PI * k) * F.col("__t") / F.col("__nd")
        aggs.append(F.sum(q(F.col("__v") * F.cos(ang))).alias(f"__c_{k}"))
        aggs.append(F.sum(q(F.col("__v") * F.sin(ang))).alias(f"__s_{k}"))
    agg = base.agg(*aggs)
    powers = F.array(*[
        F.struct(
            F.lit(k).cast("int").alias("k"),
            (
                (
                    F.pow(F.col(f"__c_{k}").cast("double") / F.lit(units), 2.0)
                    + F.pow(F.col(f"__s_{k}").cast("double") / F.lit(units), 2.0)
                ) / F.col("__n").cast("double")
            ).alias("power"),
        )
        for k in range(1, max_freq + 1)
    ])
    return agg.select(F.explode(powers).alias("p")).select(
        F.col("p.k").alias("k"), F.col("p.power").alias("power")
    )


def max_drawdown(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    units: float = 1e4,
) -> DataFrame:
    """Maximum drawdown of a cumulative series (Magdon-Ismail &
    Atiya, Risk 2004 formalize the statistic): with the running total
    C_t = sum_{i<=t} v_i, the drawdown at t is ``max_{i<=t} C_i - C_t``
    and MDD its maximum — the worst peak-to-trough fall.

    Exact-integer cumulative sums (values quantized to ``units``), two
    chained ordered windows over a rollup-sized series, one argmax
    row-pick (deepest drawdown; earliest trough on ties).  Output:
    ``(max_drawdown, trough_t, peak_value, trough_value)``."""
    w = Window.orderBy("__o")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    vu = F.floor(F.col(value_col).cast("double") * F.lit(units)
                 + F.lit(0.5)).cast("bigint")
    base = df.select(F.col(order_col).alias("__o"), vu.alias("__vu"))
    cum = base.select("__o", F.sum("__vu").over(wc).alias("__c"))
    dd = cum.select(
        "__o", "__c",
        F.max("__c").over(wc).alias("__peak"),
    ).select(
        "__o", "__c", "__peak",
        (F.col("__peak") - F.col("__c")).alias("__dd"),
    )
    best = dd.agg(
        F.max_by(
            F.struct(F.col("__dd"), F.col("__o").alias("__tt"),
                     F.col("__peak"), F.col("__c")),
            F.struct(F.col("__dd"), -F.col("__o")),
        ).alias("__m")
    )
    return best.select(
        (F.col("__m.__dd").cast("double") / F.lit(units))
        .alias("max_drawdown"),
        F.col("__m.__tt").alias("trough_t"),
        (F.col("__m.__peak").cast("double") / F.lit(units))
        .alias("peak_value"),
        (F.col("__m.__c").cast("double") / F.lit(units))
        .alias("trough_value"),
    )


def newey_west_se(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    max_lag: int = 5,
    units: float = 1e4,
) -> DataFrame:
    """Newey-West (HAC) standard error of a series mean (Newey & West,
    Econometrica 1987) with Bartlett-kernel weights:

        LRV = g0 + 2 * sum_k (1 - k/(L+1)) g_k,
        g_k = (1/n) sum_{t>k} (x_t - xbar)(x_{t-k} - xbar)

    — the autocorrelation-robust uncertainty for a rollup-series mean
    (the iid SE understates it under positive serial correlation).
    The mean comes from exact ``units``-quantized integer sums; each
    lag product is quantized to integers before its reduction, so the
    whole readout is engine-reproducible.  One broadcast + one lag
    window + one aggregate.  Output: ``(mean, se_iid, se_nw, lrv,
    n)``."""
    vu = F.floor(F.col(value_col).cast("double") * F.lit(units)
                 + F.lit(0.5)).cast("bigint")
    base = df.select(F.col(order_col).alias("__o"), vu.alias("__vu"))
    m = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__vu").cast("decimal(19,0)")).alias("__s"),
    )
    j = base.crossJoin(F.broadcast(m))
    mean_u = F.col("__s").cast("double") / F.col("__n").cast("double")
    d = (F.col("__vu").cast("double") - mean_u) / F.lit(units)
    w = Window.orderBy("__o")
    lagged = j.select(
        "__n",
        d.alias("__d"),
        *[
            F.lag(d, k).over(w).alias(f"__d_{k}")
            for k in range(1, max_lag + 1)
        ],
    )

    def q(expr):
        return F.floor(expr + F.lit(0.5)).cast("bigint")

    agg = lagged.agg(
        F.first("__n").alias("__n"),
        F.sum(q(F.col("__d") * F.col("__d"))).alias("__g0"),
        *[
            F.sum(q(F.col("__d") * F.col(f"__d_{k}"))).alias(f"__g_{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    n = F.col("__n").cast("double")
    g0 = F.col("__g0").cast("double") / n
    lrv = g0
    for k in range(1, max_lag + 1):
        wk = F.lit(1.0) - F.lit(float(k)) / F.lit(float(max_lag + 1))
        lrv = lrv + F.lit(2.0) * wk * (F.col(f"__g_{k}").cast("double") / n)
    return agg.crossJoin(F.broadcast(m.select(
        (F.col("__s").cast("double") / F.col("__n").cast("double")
         / F.lit(units)).alias("__mean")
    ))).select(
        F.col("__mean").alias("mean"),
        F.sqrt(g0 / n).alias("se_iid"),
        F.sqrt(lrv / n).alias("se_nw"),
        lrv.alias("lrv"),
        F.col("__n").cast("bigint").alias("n"),
    )


def variance_ratio(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    qs: Sequence[int] = (2, 4, 8),
    units: float = 1e4,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio statistics (Lo & MacKinlay, RFS
    1988 — the random-walk diagnostic): for each horizon ``q``,

        VR(q) = Var(overlapping q-sums) / (q * Var(x)),
        z(q)  = (VR - 1) * sqrt(n*q) / sqrt(2(2q-1)(q-1) / (3q))

    (the homoscedastic form).  Values quantize to ``units`` integers;
    overlapping q-sums are window sums of those integers, so every
    variance is an exact-moment ratio.  One window projection + one
    aggregate.  Output: ``(q, vr, z, n_windows)`` rows."""
    qs = list(qs)
    w = Window.orderBy("__o")
    vu = F.floor(F.col(value_col).cast("double") * F.lit(units)
                 + F.lit(0.5)).cast("bigint")
    base = df.select(F.col(order_col).alias("__o"), vu.alias("__vu"))
    proj = base.select(
        "__vu",
        *[
            F.when(
                F.count(F.lit(1)).over(
                    w.rowsBetween(-(q - 1), 0)
                ) == q,
                F.sum("__vu").over(w.rowsBetween(-(q - 1), 0)),
            ).alias(f"__sq_{q}")
            for q in qs
        ],
    )
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    aggs = [
        F.count(F.col("__vu")).alias("__n"),
        F.sum(dec(F.col("__vu"))).alias("__s"),
        F.sum(dec(F.col("__vu")) * F.col("__vu")).alias("__ss"),
    ]
    for q in qs:
        c = F.col(f"__sq_{q}")
        aggs += [
            F.count(c).alias(f"__n_{q}"),
            F.sum(dec(c)).alias(f"__s_{q}"),
            F.sum(dec(c) * c).alias(f"__ss_{q}"),
        ]
    agg = proj.agg(*aggs)

    def var(n_c, s_c, ss_c):
        n = F.col(n_c).cast("decimal(19,0)")
        return (
            (n * F.col(ss_c) - F.col(s_c) * F.col(s_c)).cast("double")
            / (n * (n - F.lit(1).cast("decimal(19,0)"))).cast("double")
        )

    v1 = var("__n", "__s", "__ss")
    rows = []
    for q in qs:
        vq = var(f"__n_{q}", f"__s_{q}", f"__ss_{q}")
        vr = vq / (F.lit(float(q)) * v1)
        # z = (VR-1) * sqrt(nq / phi), phi = 2(2q-1)(q-1)/(3q) — folded
        # into ONE sqrt of integer-exact doubles: a 17-digit phi**0.5
        # literal round-trips differently through DuckDB's DECIMAL
        # literal parser (decimal->double conversion is 1 ulp off), so
        # both engines build the radicand from small exact integers
        # instead and take one correctly-rounded sqrt.
        z = (vr - F.lit(1.0)) * F.sqrt(
            F.col("__n").cast("double")
            * F.lit(float(3 * q * q))
            / F.lit(float(2 * (2 * q - 1) * (q - 1)))
        )
        rows.append(F.struct(
            F.lit(q).cast("int").alias("q"),
            vr.alias("vr"), z.alias("z"),
            F.col(f"__n_{q}").cast("bigint").alias("n_windows"),
        ))
    return agg.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def spectral_entropy(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    max_freq: int = 10,
    units: float = 1e3,
) -> DataFrame:
    """Normalized spectral entropy over the first ``max_freq``
    periodogram harmonics (the tsfeatures 'forecastability' measure;
    Goerg 2013's ForeCA omega is 1 minus this):

        H = - sum_k p_k ln p_k / ln K,   p_k = P_k / sum P

    Low H = concentrated spectrum = predictable series.  Every power
    derives from the SAME quantized integer cos/sin sums as
    :func:`periodogram` (P in squared units cancels in the shares),
    and both reductions over k are FIXED-ORDER expression sums — no
    row-order dependence anywhere.  Output: one row
    ``(spectral_entropy, k)``."""
    t = F.col(order_col).cast("double")
    v = F.col(value_col).cast("double")
    nn = df.agg(F.count(F.lit(1)).alias("__n"))
    base = df.crossJoin(F.broadcast(nn)).select(
        t.alias("__t"), v.alias("__v"),
        F.col("__n").cast("double").alias("__nd"),
    )

    def q(expr):
        return F.floor(expr * F.lit(units) + F.lit(0.5)).cast("bigint")

    aggs = []
    for k in range(1, max_freq + 1):
        ang = F.lit(_TWO_PI * k) * F.col("__t") / F.col("__nd")
        aggs.append(F.sum(q(F.col("__v") * F.cos(ang)))
                    .cast("decimal(19,0)").alias(f"__c_{k}"))
        aggs.append(F.sum(q(F.col("__v") * F.sin(ang)))
                    .cast("decimal(19,0)").alias(f"__s_{k}"))
    agg = base.agg(*aggs)
    p2 = {
        k: F.col(f"__c_{k}") * F.col(f"__c_{k}")
        + F.col(f"__s_{k}") * F.col(f"__s_{k}")
        for k in range(1, max_freq + 1)
    }
    tot = p2[1]
    for k in range(2, max_freq + 1):
        tot = tot + p2[k]
    withp = agg.select(
        *[
            (p2[k].cast("double") / tot.cast("double")).alias(f"__p_{k}")
            for k in range(1, max_freq + 1)
        ]
    )
    h = None
    for k in range(1, max_freq + 1):
        pk = F.col(f"__p_{k}")
        term = F.when(pk > 0.0, -pk * F.log(pk)).otherwise(F.lit(0.0))
        h = term if h is None else h + term
    return withp.select(
        (h / F.log(F.lit(float(max_freq)))).alias("spectral_entropy"),
        F.lit(max_freq).cast("int").alias("k"),
    )


def seasonal_naive_accuracy(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    season: int = 7,
    unit: int = 1_000_000,
) -> DataFrame:
    """Forecast-baseline comparison on an ordered series: in-sample
    MAE of the naive forecast (y_hat_t = y_{t-1}) vs the seasonal
    naive (y_hat_t = y_{t-season}), and the seasonal variant's MASE
    (Hyndman & Koehler, "Another look at measures of forecast
    accuracy", IJF 2006 — MASE scales a forecast's MAE by the naive
    MAE, the recommended scale-free benchmark every real forecast must
    beat).

    Two lag windows + one aggregate over the period-rollup frame.
    Absolute errors are quantized to ``1/unit`` before the integer
    sums, so both MAEs — and their MASE ratio — are deterministic
    functions of the integer error table.  Returns ONE row:
    ``(n_naive, n_seasonal, mae_naive, mae_seasonal, mase_seasonal)``.
    """
    if season < 2:
        raise ValueError("season must be >= 2")
    o, v = F.col(order_col), F.col(value_col).cast("double")
    w = Window.orderBy(o)
    lagged = df.select(
        v.alias("v"),
        F.lag(v, 1).over(w).alias("l1"),
        F.lag(v, season).over(w).alias("ls"),
    )
    q = lambda x: F.floor(x * F.lit(float(unit)) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    # count PAIRS, not lags: a null current value contributes no
    # error term, so it must not inflate the MAE denominator either
    agg = lagged.agg(
        F.count(
            F.when(F.col("v").isNotNull() & F.col("l1").isNotNull(), 1)
        ).alias("n_naive"),
        F.count(
            F.when(F.col("v").isNotNull() & F.col("ls").isNotNull(), 1)
        ).alias("n_seasonal"),
        F.sum(q(F.abs(F.col("v") - F.col("l1")))).alias("__e1"),
        F.sum(q(F.abs(F.col("v") - F.col("ls")))).alias("__es"),
    )
    mae1 = F.col("__e1").cast("double") / F.lit(float(unit)) / F.col(
        "n_naive"
    ).cast("double")
    maes = F.col("__es").cast("double") / F.lit(float(unit)) / F.col(
        "n_seasonal"
    ).cast("double")
    return agg.select(
        "n_naive",
        "n_seasonal",
        mae1.alias("mae_naive"),
        maes.alias("mae_seasonal"),
        (maes / mae1).alias("mase_seasonal"),
    )


def turning_points_test(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    unit: int = 10_000,
) -> DataFrame:
    """Turning-points test of randomness (Kendall & Stuart, *The
    Advanced Theory of Statistics* vol. 3; Bienayme 1874 for the
    moments): count local extrema — t is a turning point when
    ``y_{t-1} < y_t > y_{t+1}`` or ``y_{t-1} > y_t < y_{t+1}`` — and
    compare against the i.i.d. moments

        E[T] = 2 (n - 2) / 3,   Var[T] = (16 n - 29) / 90 .

    The series is quantized to ``1/unit`` so every comparison is an
    integer one (ties break monotone runs and are NOT turning points —
    the strict-inequality convention; the classical test assumes a
    continuous law).  Returns ONE row ``(n, t_points, expected, z)``."""
    w = Window.orderBy(order_col)
    vu = F.floor(
        F.col(value_col).cast("double") * F.lit(float(unit)) + F.lit(0.5)
    ).cast("bigint")
    d = df.select(F.col(order_col).alias("__o"), vu.alias("v")).select(
        "v",
        F.lag("v", 1).over(Window.orderBy("__o")).alias("p"),
        F.lead("v", 1).over(Window.orderBy("__o")).alias("nx"),
    ).where(F.col("p").isNotNull() & F.col("nx").isNotNull())
    is_tp = (
        ((F.col("p") < F.col("v")) & (F.col("v") > F.col("nx")))
        | ((F.col("p") > F.col("v")) & (F.col("v") < F.col("nx")))
    ).cast("bigint")
    agg = d.agg(
        (F.count(F.lit(1)) + F.lit(2)).alias("n"),
        F.sum(is_tp).alias("t"),
    )
    n = F.col("n").cast("double")
    e = F.lit(2.0) * (n - F.lit(2.0)) / F.lit(3.0)
    v = (F.lit(16.0) * n - F.lit(29.0)) / F.lit(90.0)
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("t").cast("bigint").alias("t_points"),
        e.alias("expected"),
        ((F.col("t").cast("double") - e) / F.sqrt(v)).alias("z"),
    )


def von_neumann_ratio(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    quantize: int = 10000,
) -> DataFrame:
    """Von Neumann ratio of successive differences (von Neumann, Ann.
    Math. Statist. 1941; the Abbe criterion) — the classic
    randomness-against-trend screen beside the runs and turning-points
    tests, and the finite-sample relative of the Durbin-Watson
    statistic:

        vn = (sum d_t^2 / (n-1)) / (sum (x - xbar)^2 / n),   d_t = x_t - x_{t-1}

    Expectation 2 under independence; vn < 2 flags positive serial
    correlation, vn > 2 alternation.  ``z`` is the normal deviate
    (vn - 2) / sqrt(4 (n-2) / (n^2 - 1)) (Young 1941's variance).

    Determinism: values quantize to ``1/quantize`` units, so both the
    difference and deviation sums are exact integers (decimal-widened
    squares) combined as ``vn = n^2 sum d^2 / ((n-1)(n sum x^2 - S^2))``
    — one double division at the end.  The lag runs over an ordered
    window on the rollup-sized series frame (the documented daily
    -series contract: pre-aggregate before calling at scale)."""
    x = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    base = df.where(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(F.col(order_col).alias("__t"), x.alias("__x"))
    w = Window.orderBy("__t")
    d = F.col("__x") - F.lag("__x").over(w)
    lagged = base.select(
        "__x", d.alias("__d")
    )
    agg = lagged.agg(
        F.sum(
            F.when(
                F.col("__d").isNotNull(),
                F.col("__d").cast("decimal(19,0)") * F.col("__d"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sd2"),
        F.sum(F.col("__x").cast("decimal(19,0)") * F.col("__x")).alias(
            "sx2"
        ),
        F.sum(F.col("__x").cast("decimal(19,0)")).alias("sx"),
        F.count(F.lit(1)).alias("n"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * n * F.col("sd2")).cast("double")
    den_dec = (n - 1).cast("decimal(38,0)") * (
        n * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    # constant series (zero variance) or n <= 2: NULL per the ANSI
    # divide-by-zero rule — same contract as von_neumann_by_group
    vn = F.when(
        (F.col("n") > 2) & (den_dec > 0), num / den_dec.cast("double")
    )
    nd = F.col("n").cast("double")
    z = (vn - 2.0) / F.sqrt(
        4.0 * (nd - 2.0) / (nd * nd - 1.0)
    )
    return agg.select(
        vn.alias("vn_ratio"),
        z.alias("z"),
        F.col("n").cast("bigint").alias("n"),
    )


def cox_stuart_test(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    quantize: int = 10000,
) -> DataFrame:
    """Cox-Stuart trend test (Cox & Stuart, Biometrika 1955): a sign
    test on pairs (x_i, x_{i+h}) with h = ceil(n/2) — the
    distribution-free quick screen beside Mann-Kendall (which weighs
    ALL pairs; Cox-Stuart uses n/2 independent ones, so it is the
    cheap first look):

        n_plus  = #{x_{i+h} > x_i},  n_minus = #{x_{i+h} < x_i}
        z = (n_plus - n_minus) / sqrt(n_plus + n_minus)

    (ties drop out; z is the +-1 sign-sum normal deviate).  Values
    quantize to ``1/quantize`` units so comparisons are integer-exact
    on both engines.  The pairing is ONE equi-join of the indexed
    series with itself on t + h = t' (rollup-sized frames, the
    documented daily-series contract)."""
    x = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    idx = (
        df.where(F.col(value_col).isNotNull() & F.col(order_col).isNotNull())
        .select(F.col(order_col).alias("__o"), x.alias("__x"))
        .withColumn("__t", F.row_number().over(Window.orderBy("__o")))
    )
    tot = idx.agg(F.count(F.lit(1)).alias("__n"))
    a = idx.crossJoin(F.broadcast(tot)).where(
        F.col("__t") <= F.col("__n") - F.floor(
            (F.col("__n") + 1) / 2
        )
    )
    h = F.floor((F.col("__n") + 1) / 2)
    b = idx.select(
        F.col("__t").alias("__t2"), F.col("__x").alias("__x2")
    )
    pairs = a.join(b, a["__t"] + h == b["__t2"])
    agg = pairs.agg(
        F.sum((F.col("__x2") > F.col("__x")).cast("int")).alias("n_plus"),
        F.sum((F.col("__x2") < F.col("__x")).cast("int")).alias("n_minus"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.max("__n").alias("n"),
    )
    # all-ties series: zero informative pairs -> NULL z (ANSI
    # divide-by-zero rule, both engines)
    z = F.when(
        F.col("n_plus") + F.col("n_minus") > 0,
        (F.col("n_plus") - F.col("n_minus")).cast("double")
        / F.sqrt((F.col("n_plus") + F.col("n_minus")).cast("double")),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("n_plus").cast("bigint").alias("n_plus"),
        F.col("n_minus").cast("bigint").alias("n_minus"),
        z.alias("z"),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    order_col: str,
    value_col: str,
    season_col: str,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch, Slack & Smith, Water
    Resources Research 1982): the Mann-Kendall S statistic computed
    WITHIN each season (pairs never cross seasons, so a strong weekly
    cycle cannot masquerade as trend), seasonal S and tie-corrected
    variances summed:

        S = sum_g S_g,   Var = sum_g Var_g,
        z = (S -/+ 1) / sqrt(Var)

    Same scale contract as :func:`mann_kendall`: the pair enumeration
    is a banded self-join over the ROLLUP-sized series frame,
    partitioned by season; S and the tie terms stay exact integers.
    Returns one row ``(s, var_s, z, n, n_seasons)``."""
    idx = df.select(
        F.col(season_col).alias("__g"),
        F.col(order_col).alias("__o"),
        F.col(value_col).cast("double").alias("__x"),
    ).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__g").orderBy("__o")),
    )
    a, b = idx.alias("a"), idx.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__g") == F.col("b.__g"))
        & (F.col("a.__rn") < F.col("b.__rn")),
    ).select(
        F.signum(F.col("b.__x") - F.col("a.__x")).cast("long").alias("sg")
    )
    s_frame = pairs.agg(F.sum("sg").alias("s"))
    per_season = (
        idx.groupBy("__g", "__x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("__g")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum("t").alias("n_g"),
        )
    )
    var_tot = per_season.agg(
        F.sum(
            F.col("n_g")
            * (F.col("n_g") - 1)
            * (2 * F.col("n_g") + 5)
            - F.col("tie_term")
        ).alias("var18"),
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("n_seasons"),
    )
    j = s_frame.crossJoin(F.broadcast(var_tot))
    var_s = F.col("var18").cast("double") / F.lit(18.0)
    s = F.col("s").cast("double")
    z = (
        F.when(F.col("s") > 0, (s - F.lit(1.0)) / F.sqrt(var_s))
        .when(F.col("s") < 0, (s + F.lit(1.0)) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("s").cast("bigint").alias("s"),
        var_s.alias("var_s"),
        z.alias("z"),
        F.col("n").cast("bigint").alias("n"),
        F.col("n_seasons").cast("bigint").alias("n_seasons"),
    )


def dixon_q(
    df: DataFrame,
    value_col: str,
    *,
    quantize: int = 10000,
) -> DataFrame:
    """Dixon's Q ratios for the two extreme observations (Dixon,
    Ann. Math. Statist. 1950; the r10 gap-over-range form) — the
    small-sample outlier screen beside Grubbs (which assumes
    normal-scale moments; Dixon uses only order statistics):

        q_low  = (x_(2) - x_(1)) / (x_(n) - x_(1))
        q_high = (x_(n) - x_(n-1)) / (x_(n) - x_(1))

    Values quantize to integers; the four order statistics come from
    one min/max + rank-window pass over the ROLLUP-sized frame (the
    daily-series contract).  Returns one row ``(n, x_min, x_second,
    x_penult, x_max, q_low, q_high)`` — NULL ratios when the range is
    zero (ANSI divide-by-zero rule)."""
    x = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    base = df.where(F.col(value_col).isNotNull()).select(x.alias("__x"))
    ranked = base.select(
        "__x",
        F.row_number().over(Window.orderBy("__x")).alias("__ra"),
        F.row_number().over(Window.orderBy(F.desc("__x"))).alias("__rd"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__n"),
    )
    agg = ranked.agg(
        F.min("__x").alias("lo"),
        F.max("__x").alias("hi"),
        F.min(F.when(F.col("__ra") == 2, F.col("__x"))).alias("second"),
        F.min(F.when(F.col("__rd") == 2, F.col("__x"))).alias("penult"),
        F.max("__n").alias("n"),
    )
    rng = (F.col("hi") - F.col("lo")).cast("double")
    q = F.lit(float(quantize))
    q_low = F.when(
        F.col("hi") > F.col("lo"),
        (F.col("second") - F.col("lo")).cast("double") / rng,
    )
    q_high = F.when(
        F.col("hi") > F.col("lo"),
        (F.col("hi") - F.col("penult")).cast("double") / rng,
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        (F.col("lo").cast("double") / q).alias("x_min"),
        (F.col("second").cast("double") / q).alias("x_second"),
        (F.col("penult").cast("double") / q).alias("x_penult"),
        (F.col("hi").cast("double") / q).alias("x_max"),
        q_low.alias("q_low"),
        q_high.alias("q_high"),
    )


def holt_forecast(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    alpha_inv: int = 2,
    beta_inv: int = 4,
    horizons: int = 7,
    quantize: int = 10000,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing (Holt 1957, reprinted
    IJF 2004; Gardner 1985) with DYADIC smoothing weights alpha =
    1/alpha_inv, beta = 1/beta_inv so the entire recursion runs in
    exact integer arithmetic:

        l_t = floor((y_t + (alpha_inv-1) (l_{t-1} + b_{t-1})) / alpha_inv)
        b_t = floor(((l_t - l_{t-1}) + (beta_inv-1) b_{t-1}) / beta_inv)

    initialized l_2 = y_2, b_2 = y_2 - y_1 and folded over t = 3..n.
    Each floor is the declared per-step quantization (error < 1
    quantum per step, identical both engines), so the final state is
    bit-reproducible — the trajectory-replay discipline of the GLM
    fits applied to a smoother.

    Scale shape: the ROLLUP-sized series is gathered into ONE ordered
    array (array_sort of (t, y) structs) and the recursion is a
    single in-plan ``F.aggregate`` fold — no driver loop, no
    per-step jobs.  Returns ``horizons`` rows ``(h, forecast, level,
    trend)`` with the h-step-ahead forecast l_n + h b_n."""
    y = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    base = df.where(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(F.col(order_col).alias("__o"), y.alias("__y"))
    arr = base.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__o"), F.col("__y")))
        ).alias("__a")
    ).select(F.transform("__a", lambda s: s["__y"]).alias("__v"))

    a1 = F.lit(alpha_inv - 1)
    ai = F.lit(alpha_inv)
    b1 = F.lit(beta_inv - 1)
    bi = F.lit(beta_inv)

    def step(acc, yv):
        l_new = F.floor(
            (yv + a1 * (acc["l"] + acc["b"])) / ai
        ).cast("bigint")
        b_new = F.floor(
            ((l_new - acc["l"]) + b1 * acc["b"]) / bi
        ).cast("bigint")
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    init = F.struct(
        F.element_at("__v", 2).alias("l"),
        (F.element_at("__v", 2) - F.element_at("__v", 1)).alias("b"),
    )
    rest = F.slice(F.col("__v"), 3, F.greatest(F.size("__v") - 2, F.lit(0)))
    state = arr.select(
        F.aggregate(rest, init, step).alias("__s"),
    ).select(
        F.col("__s.l").alias("__l"), F.col("__s.b").alias("__b")
    )
    hs = state.select(
        "__l",
        "__b",
        F.explode(F.sequence(F.lit(1), F.lit(horizons))).alias("h"),
    )
    q = F.lit(float(quantize))
    return hs.select(
        F.col("h").cast("int").alias("h"),
        ((F.col("__l") + F.col("h") * F.col("__b")).cast("double") / q).alias(
            "forecast"
        ),
        (F.col("__l").cast("double") / q).alias("level"),
        (F.col("__b").cast("double") / q).alias("trend"),
    )


def von_neumann_by_group(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    *,
    quantize: int = 10000,
) -> DataFrame:
    """Per-group :func:`von_neumann_ratio` from ONE scan: the lag
    window partitions by group, the moment aggregate groups by it —
    each series gets its own successive-difference ratio and normal
    deviate (the per-segment randomness screen; series shorter than
    3 points return NULLs per the ANSI divide-by-zero rule)."""
    x = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    base = df.where(
        F.col(value_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("__g"),
        F.col(order_col).alias("__t"),
        x.alias("__x"),
    )
    w = Window.partitionBy("__g").orderBy("__t")
    d = F.col("__x") - F.lag("__x").over(w)
    lagged = base.select("__g", "__x", d.alias("__d"))
    agg = lagged.groupBy("__g").agg(
        F.sum(
            F.when(
                F.col("__d").isNotNull(),
                F.col("__d").cast("decimal(19,0)") * F.col("__d"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sd2"),
        F.sum(F.col("__x").cast("decimal(19,0)") * F.col("__x")).alias(
            "sx2"
        ),
        F.sum(F.col("__x").cast("decimal(19,0)")).alias("sx"),
        F.count(F.lit(1)).alias("n"),
    )
    n = F.col("n").cast("decimal(38,0)")
    den_dec = (n - 1).cast("decimal(38,0)") * (
        n * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    vn = F.when(
        (F.col("n") > 2) & (den_dec > 0),
        (n * n * F.col("sd2")).cast("double") / den_dec.cast("double"),
    )
    nd = F.col("n").cast("double")
    z = (vn - 2.0) / F.sqrt(4.0 * (nd - 2.0) / (nd * nd - 1.0))
    return agg.select(
        F.col("__g").alias(group_col),
        vn.alias("vn_ratio"),
        z.alias("z"),
        F.col("n").cast("bigint").alias("n"),
    )


def cum_periodogram_test(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    max_freq: int = 10,
) -> DataFrame:
    """Bartlett's cumulative-periodogram white-noise test (Bartlett
    1955; the Kolmogorov-style band on the normalized spectral CDF):
    under white noise the cumulative periodogram climbs the diagonal,
    so the sup gap

        D = max_{j < m} | C_j - j/m |,   C_j = sum_{k<=j} P_k / sum P

    flags hidden periodicity that any single harmonic test can miss.
    Rides :func:`periodogram` unchanged (pinned 2-pi literal,
    quantized spectral sums); each power is u6-floor-quantized so the
    cumulative and the sup run in pure integer arithmetic —
    D = max |cum_j m - j tot| / (m tot).  Returns one row
    ``(d_stat, m)``."""
    pg = periodogram(df, order_col, value_col, max_freq=max_freq)
    q = pg.select(
        "k",
        F.floor(F.col("power") * F.lit(1e6)).cast("bigint").alias("p"),
    )
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = q.select("k", F.sum("p").over(w).alias("cum"))
    t = c.agg(F.max("cum").alias("tot"), F.max("k").alias("m"))
    d = (
        c.crossJoin(F.broadcast(t))
        .where(F.col("k") < F.col("m"))
        .agg(
            F.max(
                F.abs(
                    F.col("cum").cast("decimal(38,0)") * F.col("m")
                    - F.col("k").cast("decimal(38,0)") * F.col("tot")
                )
            ).alias("dnum"),
            F.max("m").alias("m"),
            F.max("tot").alias("tot"),
        )
    )
    stat = F.col("dnum").cast("double") / (
        F.col("m").cast("double") * F.col("tot").cast("double")
    )
    return d.select(
        stat.alias("d_stat"), F.col("m").cast("int").alias("m")
    )


def record_counts(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    quantize: int = 10000,
) -> DataFrame:
    """Record statistics of a series (Foster & Stuart, JRSS-B 1954;
    Glick, Am. Math. Monthly 1978's "breaking records"): the number
    of running maxima (upper records) and running minima (lower
    records).  Under exchangeability both counts have expectation
    H_n = sum 1/k, so a surplus of upper records is a trend signal
    that needs NO distributional assumptions at all — the cheapest
    trend screen beside Cox-Stuart.

    Values quantize to integers (strict > on the integer grid is the
    declared tie rule: ties never set records); the running extremes
    are one ordered window over the ROLLUP-sized frame; H_n sums
    u9-quantized reciprocals so the expectation is partition-order
    -free.  Returns one row ``(n, n_record_high, n_record_low,
    expected)``."""
    x = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    base = df.where(
        F.col(value_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(F.col(order_col).alias("__t"), x.alias("__x"))
    w = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rn = F.row_number().over(Window.orderBy("__t"))
    flags = base.select(
        (F.col("__x") > F.max("__x").over(w)).cast("int").alias("__hi"),
        (F.col("__x") < F.min("__x").over(w)).cast("int").alias("__lo"),
        rn.alias("__rn"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n"),
        # the first observation is a record by convention
        (F.sum(F.coalesce(F.col("__hi"), F.lit(1)))).alias("n_hi"),
        (F.sum(F.coalesce(F.col("__lo"), F.lit(1)))).alias("n_lo"),
        F.sum(
            F.floor(F.lit(1e9) / F.col("__rn")).cast("bigint")
        ).alias("h_u9"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_hi").cast("bigint").alias("n_record_high"),
        F.col("n_lo").cast("bigint").alias("n_record_low"),
        (F.col("h_u9").cast("double") / 1e9).alias("expected"),
    )
