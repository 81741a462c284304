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
