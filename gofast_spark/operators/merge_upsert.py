"""MERGE INTO semantics (upsert) over plain DataFrames.

The flat-table companion to operators/scd.py (which keeps history):
apply a change batch to a current-state table with the standard
``MERGE`` clause semantics —

    WHEN MATCHED [AND cond]      THEN UPDATE  (source wins)
    WHEN MATCHED AND delete_cond THEN DELETE
    WHEN NOT MATCHED             THEN INSERT

Spark-first: ONE full-outer join on the key and a row-level
``CASE``-style resolution; no per-row logic, no driver loop.  The key
join is the only shuffle, and if the change batch is small it
broadcasts (AQE or an explicit ``broadcast(source)`` by the caller).
Re-applying the same batch is a no-op (idempotent upsert), which is
the property that makes the operator safe under at-least-once
delivery — the same guarantee the streaming warehouse sink
(streaming/ops.py) provides per-batch.

Duplicate keys in the source are rejected up front (ambiguous merge —
the same rule Delta Lake enforces); pre-dedup with ``dropDuplicates``
or an argmax if the batch can carry multiple versions of a key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_col(name: str) -> Column:
    """Reference a TARGET-side column inside a merge condition."""
    return F.col(f"__t_{name}")


def source_col(name: str) -> Column:
    """Reference a SOURCE-side column inside a merge condition."""
    return F.col(f"__s_{name}")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str] | str,
    *,
    delete_condition: Column | None = None,
    update_condition: Column | None = None,
    check_unique_source: bool = True,
) -> DataFrame:
    """New target state after merging ``source``.

    Rows are resolved per key: source-only rows insert; matched rows
    take the source values when ``update_condition`` (evaluated on the
    matched pair; default always) holds, else keep the target values;
    matched rows satisfying ``delete_condition`` are dropped.  Columns
    = target columns; source must carry them all.  Conditions reference
    the two sides with :func:`target_col` / :func:`source_col`, e.g.
    ``update_condition=source_col("ver") > target_col("ver")``.

    ``check_unique_source`` adds a cheap duplicate-key guard (one agg
    over the source) that raises instead of silently producing
    multiplied rows — disable only when the batch is known unique.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = target.columns
    missing = [c for c in cols if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing target columns: {missing}")
    if check_unique_source:
        dup = (
            source.groupBy(*keys)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"ambiguous merge: duplicate source keys, e.g. "
                f"{tuple(dup[0][k] for k in keys)}"
            )

    t = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in cols],
        F.lit(True).alias("__in_t"),
    )
    s = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in cols],
        F.lit(True).alias("__in_s"),
    )
    cond = [t[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"]) for k in keys]
    j = t.join(s, cond, "full_outer")

    matched = F.coalesce(F.col("__in_t"), F.lit(False)) & F.coalesce(
        F.col("__in_s"), F.lit(False)
    )
    if delete_condition is not None:
        # MERGE deletes only when the condition is TRUE; a NULL condition
        # (e.g. `source_col("v") > 50` with NULL v) must KEEP the row, so
        # coalesce to FALSE before negating — `~(TRUE & NULL)` is NULL and
        # would silently drop it from the filter otherwise.
        j = j.where(~(matched & F.coalesce(delete_condition, F.lit(False))))
    take_source = (
        matched if update_condition is None else (matched & update_condition)
    ) | (~F.coalesce(F.col("__in_t"), F.lit(False)))
    out_cols = [
        F.when(take_source, F.col(f"__s_{c}"))
        .otherwise(F.col(f"__t_{c}"))
        .alias(c)
        for c in cols
    ]
    return j.select(*out_cols)
