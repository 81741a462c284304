"""Time-series operators (SURVEY §2.11) over an explicit timestamp column.

Spark has no row index, so every op takes ``order_by``/``partition_by``
contracts (SURVEY §4.2.2).  Lags/rolling/Fourier/differencing are window
and column expressions (JVM-side); trend/ACF reduce to covariance/corr
aggregates; only true per-series model fits (STL, ADF) would need
``applyInPandas`` and are explicitly out of this module.
"""

from gofast_spark.ts.causality import granger_causality
from gofast_spark.ts.changepoint import best_changepoint, chow_test, cusum
from gofast_spark.ts.engineering import (
    acf,
    ar_forecast,
    brown_forecast,
    double_ewma,
    ewma,
    mann_kendall,
    ccf,
    pacf,
    pacf_frame,
    detrend,
    trend_analysis,
    ts_engineering,
    transform_stationarity,
)
from gofast_spark.ts.validator import infer_frequency, smart_ts_detector, time_step_grid, ts_validator
from gofast_spark.ts.decompose import (
    adf_test,
    kpss_test,
    savgol_smooth,
    seasonal_decompose,
    stl_decompose,
)
from gofast_spark.ts.split import ts_outlier_detector, ts_split

__all__ = [
    "ts_validator",
    "infer_frequency",
    "ts_engineering",
    "transform_stationarity",
    "trend_analysis",
    "detrend",
    "acf",
    "best_changepoint",
    "chow_test",
    "cusum",
    "ar_forecast",
    "brown_forecast",
    "double_ewma",
    "granger_causality",
    "ewma",
    "mann_kendall",
    "ccf",
    "pacf",
    "pacf_frame",
    "smart_ts_detector",
    "time_step_grid",
    "ts_split",
    "ts_outlier_detector",
    "savgol_smooth",
    "seasonal_decompose",
    "stl_decompose",
    "adf_test",
    "kpss_test",
]
