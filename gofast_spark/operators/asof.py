"""Time as-of join (pandas ``merge_asof`` semantics, distributed).

For every left row, attach the single right row with the same key whose
timestamp is the most recent one not after the left timestamp
(``direction='backward'``; ``'forward'`` is the mirror).  The classic
uses: trade->latest-quote, event->latest-config, click->latest-view.

Scale strategy — the union-scan pattern, NOT a range join:

1. union both sides into one frame with a side marker (right rows sort
   BEFORE left rows at equal timestamps, making the match inclusive);
2. one window partitioned BY KEY and ordered by (ts, side):
   ``last(right_payload, ignorenulls=True)`` carries the latest
   preceding right values onto every left row;
3. keep the left rows; apply the optional tolerance as a filter that
   nulls out matches older than ``ts - tolerance``.

Cost: ONE hash-partitioned shuffle on the key (the same partitioning a
plain join would need) and a per-key sort — no global sort, no range
fan-out, no cross product; skewed keys are ordinary AQE territory.  A
band join (nearest_join's bucket trick) would need a tolerance to bound
the bands; the union-scan needs nothing and matches arbitrarily old
rows.

The right side must be deduplicated on (key, ts) first if several right
rows can share a timestamp — ``last`` would otherwise pick the one
latest in scan order, which the caller should make explicit.  DuckDB's
native ``ASOF JOIN`` provides the differential oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts_col: str,
    *,
    direction: str = "backward",
    tolerance: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Attach the as-of right row to every left row.

    Output: every left column, plus every non-key right column suffixed
    with ``suffix`` (including the right timestamp as ``{ts_col}{suffix}``)
    — NULL when no right row qualifies.  ``tolerance`` is an SQL interval
    string (e.g. ``'2 hours'``) bounding how stale a backward match (or
    how far a forward match) may be.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys]
    l_cols = [c for c in left.columns if c not in keys and c != ts_col]

    # the whole right row rides as ONE struct so last(ignorenulls) picks
    # an entire row atomically — per-column carries would mix values from
    # different right rows whenever a payload column contains NULLs
    # (merge_asof attaches the row, NULL fields and all)
    r_struct = F.struct(*[F.col(c).alias(c) for c in payload])
    r_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    lu = left.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(r_type).alias("__r"),
    )
    ru = right.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        r_struct.alias("__r"),
    )
    u = lu.unionByName(ru)

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__m")
    ).where(F.col("__side") == 1)

    mts = F.col("__m")[ts_col]
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        ok = (
            (mts >= F.col("__ts") - iv)
            if direction == "backward"
            else (mts <= F.col("__ts") + iv)
        )
    else:
        ok = F.lit(True)

    out_cols = [*[F.col(k) for k in keys], F.col("__ts").alias(ts_col)]
    out_cols += [F.col(c) for c in l_cols]
    out_cols += [
        F.when(ok, F.col("__m")[c]).alias(f"{c}{suffix}") for c in payload
    ]
    return carried.select(*out_cols)
