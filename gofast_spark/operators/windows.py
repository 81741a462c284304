"""Window / ordered computations (SURVEY §2.5).

The reference reaches windowed semantics through pandas rolling/shift on
the row index.  Spark has no row index, so every op here takes explicit
``order_by`` (and optional ``partition_by``) — the semantic contract change
called out in SURVEY §4.2.2.  All compile to native window expressions
(WholeStageCodegen'd, spill-aware); no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(
    order_by: str | Sequence[str],
    partition_by: str | Sequence[str] | None = None,
) -> WindowSpec:
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    if partition_by:
        parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        return Window.partitionBy(*parts).orderBy(*order)
    return Window.orderBy(*order)


def create_lag_features(
    df: DataFrame,
    value_col: str,
    lags: Sequence[int],
    order_by: str | Sequence[str],
    *,
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Shift ``value_col`` by each lag as new ``{col}_lag_{k}`` columns.

    Reference: ``create_lag_features`` (gofast/utils/ts_utils.py:4088) and
    ``LagFeatureGenerator`` (gofast/transformers/ts.py:667).
    """
    w = _window(order_by, partition_by)
    out = df
    for k in lags:
        out = out.withColumn(f"{value_col}_lag_{k}", F.lag(value_col, k).over(w))
    return out


def moving_average(
    df: DataFrame,
    value_col: str,
    window_size: int,
    order_by: str | Sequence[str],
    *,
    partition_by: str | Sequence[str] | None = None,
    min_periods: int | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Trailing rolling mean over ``window_size`` rows.

    Reference: ``MovingAverageTransformer`` (gofast/transformers/ts.py:453),
    ``moving_average`` (gofast/utils/spatial_utils.py:4065).  pandas
    ``rolling(k)`` yields NULL until ``min_periods`` rows exist; we mirror
    that with a windowed count guard.
    """
    w = _window(order_by, partition_by).rowsBetween(-(window_size - 1), 0)
    avg = F.avg(value_col).over(w)
    n = F.count(value_col).over(w)
    mp = window_size if min_periods is None else min_periods
    name = out_col or f"{value_col}_ma_{window_size}"
    return df.withColumn(name, F.when(n >= mp, avg))


def differencing(
    df: DataFrame,
    value_col: str,
    order_by: str | Sequence[str],
    *,
    periods: int = 1,
    order: int = 1,
    partition_by: str | Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Order-d differencing: ``v - lag(v, periods)`` iterated ``order`` times.

    Reference: ``DifferencingTransformer`` (gofast/transformers/ts.py:543).
    """
    w = _window(order_by, partition_by)
    name = out_col or f"{value_col}_diff"
    cur = F.col(value_col)
    for _ in range(order):
        cur = cur - F.lag(cur, periods).over(w)
    return df.withColumn(name, cur)


def rank_data(
    df: DataFrame,
    value_col: str,
    *,
    method: str = "min",
    ascending: bool = True,
    partition_by: str | Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Rank values with pandas-compatible methods.

    Reference: ``rank_data`` (gofast/utils/mathext.py:2967) — methods
    average/min/max/dense/first.  'average' is emulated as
    ``(rank + reverse-cume-count) / 2`` = mean of min and max rank.
    """
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    col = F.col(value_col)
    order = col.asc() if ascending else col.desc()
    w = Window.partitionBy(*parts).orderBy(order)
    name = out_col or f"{value_col}_rank"
    if method == "min":
        expr = F.rank().over(w).cast("double")
    elif method == "dense":
        expr = F.dense_rank().over(w).cast("double")
    elif method == "first":
        expr = F.row_number().over(w).cast("double")
    elif method in ("max", "average"):
        # max rank = min rank + count(ties) - 1; ties counted over a
        # value-partitioned window
        tie_w = Window.partitionBy(*parts, col)
        ties = F.count(F.lit(1)).over(tie_w)
        min_rank = F.rank().over(w)
        max_rank = min_rank + ties - 1
        expr = (
            max_rank.cast("double")
            if method == "max"
            else (min_rank + max_rank) / F.lit(2.0)
        )
    else:
        raise ValueError(f"unsupported method {method!r}")
    return df.withColumn(name, expr)


def fill_forward(
    df: DataFrame,
    value_col: str,
    order_by: str | Sequence[str],
    *,
    partition_by: str | Sequence[str] | None = None,
    direction: str = "ffill",
    out_col: str | None = None,
) -> DataFrame:
    """Order-dependent ffill/bfill of NULLs.

    Reference: ``handle_missing_data`` methods 'ffill'/'bfill'
    (gofast/dataops/quality.py:728-760).  ffill = last non-null over the
    preceding frame; bfill = first non-null over the following frame.
    """
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    name = out_col or value_col
    if direction == "ffill":
        w = (
            Window.partitionBy(*parts)
            .orderBy(*[F.col(c).asc() for c in order])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        expr = F.last(value_col, ignorenulls=True).over(w)
    elif direction == "bfill":
        w = (
            Window.partitionBy(*parts)
            .orderBy(*[F.col(c).asc() for c in order])
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        expr = F.first(value_col, ignorenulls=True).over(w)
    else:
        raise ValueError("direction must be ffill|bfill")
    return df.withColumn(name, expr)


def interpolate_data(
    df: DataFrame,
    value_col: str,
    order_by: str | Sequence[str],
    *,
    partition_by: str | Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation of NULL runs along an explicit ordering.

    Reference: ``interpolate_data`` (gofast/utils/base_utils.py:5628) —
    pandas ``interpolate(method='linear')`` semantics: interior NULLs get
    the linear blend of the surrounding non-NULLs (by row position),
    trailing NULLs carry the last value forward, leading NULLs stay NULL.

    All window expressions (prev/next non-null value and position via
    ignore-nulls last/first over the two directional frames).
    """
    name = out_col or f"{value_col}_interp"
    v = F.col(value_col)
    base = _window(order_by, partition_by)
    back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t = F.row_number().over(base)
    marked = df.withColumn("__t", t)
    vt = F.when(v.isNotNull(), F.col("__t"))
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(vt, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(vt, ignorenulls=True).over(fwd)
    interp = prev_v + (next_v - prev_v) * (F.col("__t") - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), F.lit(None))      # leading gap
        .when(next_v.isNull(), prev_v)           # trailing gap -> ffill
        .otherwise(interp)
    )
    return marked.withColumn(name, filled).drop("__t")


def adaptive_moving_average(
    df: DataFrame,
    value_col: str,
    order_by: str | Sequence[str],
    *,
    window_size_factor: float = 0.1,
    out_col: str | None = None,
) -> DataFrame:
    """Symmetric boxcar mean whose half-width scales with the series
    length: ``ws = int(factor * n)``, frame ``[i-ws, i+ws]`` clipped at the
    edges.

    Reference: ``adaptive_moving_average``
    (gofast/utils/spatial_utils.py:5043) — identical loop semantics.
    Two-pass: one count fixes ``ws`` (driver literal), then a single
    window average.  Intended for reduced series (the count pins a global
    frame width); partition-varying widths would need per-group counts.
    """
    name = out_col or f"{value_col}_ama"
    n = df.count()
    ws = int(window_size_factor * n)
    w = _window(order_by).rowsBetween(-ws, ws)
    return df.withColumn(name, F.avg(value_col).over(w))


def rolling_slope(
    df: DataFrame,
    value_col: str,
    time_index_col: str,
    order_by: str | Sequence[str],
    *,
    window_size: int = 14,
    partition_by: str | Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Rolling OLS slope of value vs a numeric time index over the
    trailing ``window_size`` rows:
    ``slope = (n*Σtv - Σt*Σv) / (n*Σt² - (Σt)²)``.

    Reference: ``TrendFeatureExtractor`` (gofast/transformers/ts.py:141)
    order-1 fit, windowed.  Four windowed sums — one Window node, no
    Python.  NULL where the window is degenerate (single row).
    """
    name = out_col or f"{value_col}_slope_{window_size}"
    w = _window(order_by, partition_by).rowsBetween(-(window_size - 1), 0)
    t, v = F.col(time_index_col), F.col(value_col)
    n = F.count(v).over(w)
    st = F.sum(t).over(w)
    sv = F.sum(v).over(w)
    stv = F.sum(t * v).over(w)
    stt = F.sum(t * t).over(w)
    den = n * stt - st * st
    return df.withColumn(
        name, F.when(den != 0, (n * stv - st * sv) / den)
    )


def smooth1d(
    df: DataFrame,
    value_col: str,
    order_by: str | Sequence[str],
    *,
    half_width: int = 3,
    kernel: str = "boxcar",
    partition_by: str | Sequence[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Symmetric kernel smoothing over ``±half_width`` rows.

    Reference: ``smooth1d`` (gofast/utils/base_utils.py:5221).  boxcar is
    a plain symmetric window mean; triangle weights ``k+1-|j|`` are an
    explicit lag/lead weighted sum renormalized by the weights actually
    present at the edges.  All JVM window/offset expressions.
    """
    name = out_col or f"{value_col}_smooth"
    k = half_width
    if kernel == "boxcar":
        w = _window(order_by, partition_by).rowsBetween(-k, k)
        return df.withColumn(name, F.avg(value_col).over(w))
    if kernel != "triangle":
        raise ValueError(f"unsupported kernel {kernel!r}")
    w = _window(order_by, partition_by)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(-k, k + 1):
        wt = float(k + 1 - abs(j))
        vj = F.col(value_col) if j == 0 else (
            F.lag(value_col, -j).over(w) if j < 0 else F.lead(value_col, j).over(w)
        )
        num = num + F.coalesce(vj, F.lit(0.0)) * wt
        den = den + F.when(vj.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return df.withColumn(name, num / den)


def drop_consecutive_duplicates(
    df: DataFrame,
    key_cols: "Sequence[str]",
    order_col: str,
    value_cols: "Sequence[str]",
) -> DataFrame:
    """Collapse runs of identical consecutive states per key: keep a row
    iff any of ``value_cols`` differs from the key's previous row in
    ``order_col`` order (the first row per key always survives).

    The CDC / slowly-changing-state compaction primitive — a sensor
    emitting the same reading every second compacts to its change
    points, shrinking downstream state by the run length.  One
    key-partitioned window (parallel in the number of keys); NULL-safe
    comparison via ``eqNullSafe`` so NULL -> NULL repeats also collapse.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    return (
        df.withColumn("__keep", first | ~same)
        .where(F.col("__keep"))
        .drop("__keep")
    )
