"""Time-series validation / coercion.

Reference: ``ts_validator`` (gofast/utils/ts_utils.py:471), ``to_dt``
(:251), ``smart_ts_detector`` (gofast/core/array_manager.py:881).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ts_validator(
    df: DataFrame,
    dt_col: str,
    *,
    value_col: str | None = None,
    coerce: bool = True,
    drop_null_dt: bool = True,
) -> DataFrame:
    """Validate/coerce the datetime column of a time-series frame.

    - missing column -> ValueError (the reference's error contract);
    - string/date columns are cast to timestamp when ``coerce``;
    - NULL timestamps are dropped when ``drop_null_dt`` (they have no
      position in any ordering — SURVEY §7.3.1);
    - ``value_col`` is checked numeric when given.
    """
    if dt_col not in df.columns:
        raise ValueError(f"datetime column {dt_col!r} not in frame")
    dtype = dict(df.dtypes)[dt_col]
    out = df
    if dtype not in ("timestamp", "timestamp_ntz", "date"):
        if not coerce:
            raise ValueError(f"{dt_col!r} has non-datetime type {dtype}")
        out = out.withColumn(dt_col, F.to_timestamp(F.col(dt_col)))
    if value_col is not None:
        vtype = dict(out.dtypes).get(value_col)
        if vtype not in ("double", "float", "int", "bigint", "smallint"):
            raise ValueError(f"value column {value_col!r} has type {vtype}")
    if drop_null_dt:
        out = out.where(F.col(dt_col).isNotNull())
    return out


def smart_ts_detector(df: DataFrame, *, sample_rows: int = 100) -> str:
    """Detect the datetime column of a frame (smart_ts_detector,
    gofast/core/array_manager.py:881): prefer typed timestamp/date
    columns; otherwise probe string columns by attempting ``to_timestamp``
    on a small head sample (driver-side, bounded by ``sample_rows``)."""
    for c, t in df.dtypes:
        if t in ("timestamp", "timestamp_ntz", "date"):
            return c
    str_cols = [c for c, t in df.dtypes if t == "string"]
    if str_cols:
        # try_to_timestamp: NULL on malformed input (ANSI to_timestamp throws)
        head = df.select(
            *[F.try_to_timestamp(F.col(c)).alias(c) for c in str_cols]
        ).limit(sample_rows)
        counts = head.agg(
            *[F.count(F.col(c)).alias(c) for c in str_cols]
        ).first()
        best = max(str_cols, key=lambda c: counts[c] or 0)
        if (counts[best] or 0) > 0:
            return best
    raise ValueError("no datetime-like column detected")


def time_step_grid(
    spark,
    start: str,
    end: str,
    *,
    step_seconds: int,
    col: str = "ts",
) -> DataFrame:
    """Regular timestamp spine from ``start`` to ``end`` inclusive
    (get_time_steps' grid-building half, gofast/utils/mathext.py:1631).
    ``spark.range`` based — a billion-step grid never touches the
    driver; join it against sparse data to materialize gaps."""
    s = F.unix_timestamp(F.lit(start))
    e = F.unix_timestamp(F.lit(end))
    n = spark.range(1).select(((e - s) / step_seconds).cast("long").alias("n")).first()["n"]
    return spark.range(n + 1).select(
        F.timestamp_seconds(s + F.col("id") * step_seconds).alias(col)
    )


def infer_frequency(
    df: DataFrame, dt_col: str, *, partition_by: str | None = None
) -> DataFrame:
    """Most common gap between consecutive timestamps, in seconds.

    Reference: ``smart_ts_detector`` / ``get_time_steps``
    (gofast/core/array_manager.py:881, gofast/utils/mathext.py:1631).
    lag-diff -> groupBy(gap) count -> mode; per-series with
    ``partition_by``.  Output: (partition cols?, freq_seconds, n_gaps).
    """
    from pyspark.sql import Window

    parts = [partition_by] if partition_by else []
    w = Window.partitionBy(*parts).orderBy(F.col(dt_col))
    gaps = df.select(
        *parts,
        (
            F.unix_timestamp(F.col(dt_col))
            - F.unix_timestamp(F.lag(dt_col, 1).over(w))
        ).alias("__gap"),
    ).where(F.col("__gap").isNotNull())
    counts = gaps.groupBy(*parts, "__gap").agg(F.count(F.lit(1)).alias("n_gaps"))
    w2 = Window.partitionBy(*parts).orderBy(
        F.col("n_gaps").desc(), F.col("__gap").asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") == 1)
        .select(*parts, F.col("__gap").alias("freq_seconds"), "n_gaps")
    )
