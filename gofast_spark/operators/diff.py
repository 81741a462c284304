"""Keyed table diff: the change set between two snapshots.

``table_diff`` emits one row per difference with a ``change`` tag —
``insert`` (key only in new), ``delete`` (key only in old), ``update``
(key in both, any compared column differs, null-safe).  This is the
inverse of MERGE (operators/merge_upsert.py): MERGE applies a change
set; ``table_diff`` derives one from snapshots — CDC extraction,
migration verification, replication audits.

Scale shape: ONE full outer join on the key (co-partitionable /
bucketable), change classification is a codegen projection; no window,
no collect.  Reference analog: ``Frames.compare``
(gofast/dataops/core.py:588) answers only multiset equality — the keyed
change set is net-new surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | Sequence[str],
    *,
    compare_cols: Sequence[str] | None = None,
    change_col: str = "change",
) -> DataFrame:
    """Rows that changed between ``old`` and ``new``.

    Output columns: the keys, ``change`` ('insert'|'delete'|'update'),
    then ``<col>_old`` / ``<col>_new`` for every compared column.
    Unchanged keys are not emitted.  ``compare_cols`` defaults to all
    shared non-key columns."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in new.columns and c not in keys
        ]
    cols = list(compare_cols)
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_old") for c in cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_new") for c in cols],
        F.lit(True).alias("__in_n"),
    )
    cond = [o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"]) for k in keys]
    j = o.join(n, cond, "full_outer")
    in_o = F.coalesce(F.col("__in_o"), F.lit(False))
    in_n = F.coalesce(F.col("__in_n"), F.lit(False))
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    change = (
        F.when(in_o & ~in_n, F.lit("delete"))
        .when(~in_o & in_n, F.lit("insert"))
        .when(~same, F.lit("update"))
    )
    out = j.withColumn(change_col, change).where(F.col(change_col).isNotNull())
    return out.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in keys
        ],
        change_col,
        *[x for c in cols for x in (f"{c}_old", f"{c}_new")],
    )
