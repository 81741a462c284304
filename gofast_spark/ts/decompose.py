"""Per-series model offload: Savitzky-Golay smoothing, STL decomposition,
ADF stationarity — operators whose kernels genuinely need scipy/
statsmodels (SURVEY §4.2.5).

The Spark-side plumbing is real: ``groupBy(series).applyInPandas`` with a
declared output schema ships each series to a worker as ONE Arrow batch
(size-bound your groups).  The scientific kernels are import-gated —
environments without scipy/statsmodels get a clear ImportError naming the
missing dependency, not a silent fallback (builder-brief stub policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _require(module: str):
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            f"{module} is required for this operator; install it or use the "
            "native window alternatives (smooth1d, transform_stationarity)"
        ) from e


def savgol_smooth(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    *,
    window_length: int = 7,
    polyorder: int = 2,
) -> DataFrame:
    """Savitzky-Golay filter per series (savgol_filter,
    gofast/utils/spatial_utils.py:3937) via applyInPandas."""
    _require("scipy.signal")
    schema = f"{series_col} string, {order_col} string, {value_col}_sg double"

    def fit(pdf):
        import pandas as pd
        from scipy.signal import savgol_filter

        pdf = pdf.sort_values(order_col)
        # clamp to the largest odd value <= len: len//2*2+1 rounds UP to
        # len+1 for even-length groups, which scipy rejects in 'interp' mode
        n = len(pdf)
        wl = min(window_length, n if n % 2 else n - 1)
        wl = max(wl, 3)
        smoothed = (
            savgol_filter(pdf[value_col].to_numpy(), wl, min(polyorder, wl - 1))
            if len(pdf) >= 3
            else pdf[value_col].to_numpy()
        )
        return pd.DataFrame(
            {
                series_col: pdf[series_col].astype(str),
                order_col: pdf[order_col].astype(str),
                f"{value_col}_sg": smoothed,
            }
        )

    return df.groupBy(series_col).applyInPandas(fit, schema=schema)


def stl_decompose(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    *,
    period: int = 7,
) -> DataFrame:
    """STL trend/seasonal/residual per series (decompose_ts,
    gofast/utils/ts_utils.py:2263) via applyInPandas + statsmodels."""
    _require("statsmodels.tsa.seasonal")
    schema = (
        f"{series_col} string, {order_col} string, "
        "trend double, seasonal double, resid double"
    )

    def fit(pdf):
        import pandas as pd
        from statsmodels.tsa.seasonal import STL

        pdf = pdf.sort_values(order_col)
        res = STL(pdf[value_col].to_numpy(), period=period).fit()
        return pd.DataFrame(
            {
                series_col: pdf[series_col].astype(str),
                order_col: pdf[order_col].astype(str),
                "trend": res.trend,
                "seasonal": res.seasonal,
                "resid": res.resid,
            }
        )

    return df.groupBy(series_col).applyInPandas(fit, schema=schema)


def kpss_test(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    *,
    regression: str = "c",
    nlags: int | None = None,
) -> DataFrame:
    """KPSS stationarity test per series (trend_analysis strategy='kpss',
    gofast/utils/ts_utils.py:720).  Native numpy kernel — unlike
    :func:`adf_test` there is no statsmodels dependency: the statistic is

        eta = sum_t S_t^2 / (n^2 * s2_l)

    with ``S_t`` the partial sums of the level- (``regression='c'``) or
    trend- (``'ct'``) residuals and ``s2_l`` the Bartlett-kernel long-run
    variance with ``nlags`` lags (default: the Schwert/legacy rule
    ``ceil(12 * (n/100)^0.25)``).  The p-value interpolates the published
    Kwiatkowski et al. (1992) critical-value table and is clamped to
    [0.01, 0.10] outside it, matching the conventional reporting.

    Output: (series, kpss_stat, p_value, lags, n).  Null hypothesis is
    STATIONARITY — small p rejects stationarity (opposite of ADF).
    """
    schema = (
        f"{series_col} string, kpss_stat double, p_value double, "
        "lags bigint, n bigint"
    )
    crit = {
        # stat values at p = 0.10, 0.05, 0.025, 0.01
        "c": [0.347, 0.463, 0.574, 0.739],
        "ct": [0.119, 0.146, 0.176, 0.216],
    }[regression]
    pvals = [0.10, 0.05, 0.025, 0.01]

    def fit(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=float)
        n = len(x)
        if regression == "ct":
            t = np.arange(1.0, n + 1)
            beta = np.polyfit(t, x, 1)
            e = x - np.polyval(beta, t)
        else:
            e = x - x.mean()
        q = nlags if nlags is not None else int(np.ceil(12.0 * (n / 100.0) ** 0.25))
        q = min(q, n - 1)
        s = np.cumsum(e)
        eta = float((s * s).sum()) / (n * n)
        s2 = float((e * e).sum()) / n
        for lag in range(1, q + 1):
            gamma = float((e[lag:] * e[:-lag]).sum()) / n
            s2 += 2.0 * (1.0 - lag / (q + 1.0)) * gamma
        stat = eta / s2 if s2 > 0 else float("inf")
        # np.interp needs ascending x; crit is ascending, pvals descending —
        # interp handles a descending fp fine (it's just piecewise-linear)
        p = float(np.interp(stat, crit, pvals))
        p = min(max(p, 0.01), 0.10)
        return pd.DataFrame(
            {
                series_col: [str(pdf[series_col].iloc[0])],
                "kpss_stat": [stat],
                "p_value": [p],
                "lags": [q],
                "n": [n],
            }
        )

    return df.groupBy(series_col).applyInPandas(fit, schema=schema)


def adf_test(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Augmented Dickey-Fuller stationarity per series (trend_analysis,
    gofast/utils/ts_utils.py:720) via applyInPandas + statsmodels.
    Output: (series, adf_stat, p_value, n)."""
    _require("statsmodels.tsa.stattools")
    schema = f"{series_col} string, adf_stat double, p_value double, n bigint"

    def fit(pdf):
        import pandas as pd
        from statsmodels.tsa.stattools import adfuller

        pdf = pdf.sort_values(order_col)
        stat, p = adfuller(pdf[value_col].to_numpy())[:2]
        return pd.DataFrame(
            {
                series_col: [str(pdf[series_col].iloc[0])],
                "adf_stat": [stat],
                "p_value": [p],
                "n": [len(pdf)],
            }
        )

    return df.groupBy(series_col).applyInPandas(fit, schema=schema)
