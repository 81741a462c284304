"""Exact deduplication.

Reference: ``handle_duplicates`` (gofast/dataops/quality.py:4677) with
operations drop/mark/return.  At scale the "keep first" policy needs an
explicit ordering (pandas keeps the first *index*; Spark has no row order),
so ``order_by`` is mandatory when ``keep='first'``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    keys: str | Sequence[str],
    *,
    keep: str = "first",
    order_by: str | Sequence[str] | None = None,
    group_size_col: str | None = None,
) -> DataFrame:
    """Keep one row per duplicate-key group.

    - ``keep='any'``: ``dropDuplicates`` — one shuffle, no window, the
      cheapest path when the caller doesn't care which row survives.
    - ``keep='first'``/``'last'``: deterministic winner by ``order_by``
      via ``row_number`` over a hash-partitioned window (partition key =
      dedup keys, so state is bounded per group).

    ``group_size_col`` additionally emits the duplicate-group size
    (the 'mark' flavor of the reference op).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if keep == "any" and group_size_col is None:
        return df.dropDuplicates(key_list)
    if order_by is None:
        raise ValueError("keep='first'/'last' needs order_by for determinism")
    order_list = [order_by] if isinstance(order_by, str) else list(order_by)
    order_cols = [
        F.col(c).desc() if keep == "last" else F.col(c).asc() for c in order_list
    ]
    w = Window.partitionBy(*key_list).orderBy(*order_cols)
    out = df.withColumn("__rn", F.row_number().over(w))
    if group_size_col:
        out = out.withColumn(
            group_size_col, F.count(F.lit(1)).over(Window.partitionBy(*key_list))
        )
    return out.where(F.col("__rn") == 1).drop("__rn")
