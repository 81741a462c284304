"""Date/time feature extraction.

Reference: ``convert_date_features`` (gofast/dataops/quality.py:398),
``DateFeatureExtractor`` (gofast/transformers/ts.py:989),
``DateTimeCyclicalEncoder`` (gofast/transformers/ts.py:887).
Pure column expressions — the year/month/day/sin/cos math runs inside
whole-stage codegen during the scan.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def convert_date_features(
    df: DataFrame,
    date_cols: str | Sequence[str],
    *,
    day_of_week: bool = False,
    quarter: bool = False,
) -> DataFrame:
    """Append ``{col}_year/_month/_day`` (+ optional ``_dow``, ``_quarter``)
    for each date column (gofast/dataops/quality.py:398).

    ``_dow`` follows Spark's ``dayofweek``: 1 = Sunday .. 7 = Saturday.
    """
    cols = [date_cols] if isinstance(date_cols, str) else list(date_cols)
    out = df
    for c in cols:
        d = F.col(c)
        out = out.withColumns(
            {
                f"{c}_year": F.year(d),
                f"{c}_month": F.month(d),
                f"{c}_day": F.dayofmonth(d),
            }
        )
        if day_of_week:
            out = out.withColumn(f"{c}_dow", F.dayofweek(d))
        if quarter:
            out = out.withColumn(f"{c}_quarter", F.quarter(d))
    return out


def cyclical_encode(
    df: DataFrame,
    col: str,
    period: int,
    *,
    out_prefix: str | None = None,
) -> DataFrame:
    """sin/cos encoding of a periodic integer feature
    (DateTimeCyclicalEncoder, gofast/transformers/ts.py:887):
    ``sin(2*pi*v/period)``, ``cos(2*pi*v/period)``."""
    p = out_prefix or col
    angle = 2.0 * math.pi * F.col(col) / F.lit(float(period))
    return df.withColumns(
        {f"{p}_sin": F.sin(angle), f"{p}_cos": F.cos(angle)}
    )


def ntz_to_utc_timestamp(col: Column | str) -> Column:
    """Reinterpret a TIMESTAMP_NTZ wall time as UTC, yielding a regular
    TIMESTAMP — independent of ``spark.sql.session.timeZone``.

    A plain ``cast('timestamp')`` interprets the wall time in the
    SESSION timezone (and mutating the session conf to compensate leaks
    a side effect into every later timestamp operation), so the epoch is
    assembled arithmetically instead: days since epoch from the NTZ date
    plus TZ-free wall-clock field extractions (``date_part('SECOND')``
    carries the fractional part as a decimal, so microsecond precision
    survives).
    """
    c = F.col(col) if isinstance(col, str) else col
    micros = (
        F.unix_date(c.cast("date")).cast("long") * F.lit(86400000000)
        + F.hour(c).cast("long") * F.lit(3600000000)
        + F.minute(c).cast("long") * F.lit(60000000)
        + (F.date_part(F.lit("SECOND"), c).cast("decimal(18,6)") * 1000000)
        .cast("long")
    )
    return F.timestamp_micros(micros)
