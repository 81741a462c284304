"""Slowly-changing-dimension type-2 history maintenance.

The standard warehouse pattern for dimension tables: instead of
overwriting attributes in place, every change CLOSES the current row
(stamping ``valid_to``) and appends a new open row — point-in-time
joins then reconstruct the dimension as of any date.

``scd2_merge`` is one batch step: apply a frame of updates to an
existing history.  Everything is joins + unions on the key — no window
over the history, no driver collect; the history scan is touched once.
At scale this runs as one shuffle on the dimension key (broadcast when
the update batch is small) and rewrites only the partitions it must —
pair it with a partitioned/bucketed sink.

Batch semantics: ONE version per key per batch — when several updates
for a key arrive in the same batch, the latest ``eff_col`` wins and
intermediate versions are not recorded (the usual micro-batch CDC
contract; feed finer-grained batches if every version matters).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def scd2_init(
    snapshot: DataFrame,
    eff_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Bootstrap an SCD2 history from an initial snapshot: every row
    open from its ``eff_col``."""
    return (
        snapshot.withColumn(valid_from, F.col(eff_col))
        .withColumn(valid_to, F.lit(None).cast(snapshot.schema[eff_col].dataType))
        .withColumn(current_flag, F.lit(True))
        .drop(eff_col)
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    tracked_cols: Sequence[str],
    eff_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Apply ``updates`` (key, tracked attrs, ``eff_col``) to an SCD2
    ``history``, returning the new history:

    - a key whose tracked attributes CHANGED: the open row closes at the
      update's effective time and a new open row appends;
    - an unchanged key: untouched (idempotent re-delivery is a no-op);
    - a brand-new key: inserted as an open row;
    - closed (historical) rows: pass through untouched.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tracked = list(tracked_cols)

    # latest update per key wins within the batch (deterministic: ties on
    # eff break by the tracked values themselves)
    w = Window.partitionBy(*keys).orderBy(
        F.col(eff_col).desc(), *[F.col(c).desc() for c in tracked]
    )
    up = (
        updates.select(*keys, *tracked, eff_col)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    closed_rows = history.where(~F.col(current_flag))
    open_rows = history.where(F.col(current_flag))

    # a missed left join yields struct(NULL,...) — not a NULL struct — so
    # "changed" needs an explicit has-update marker, not a coalesce.
    # The effective-time guard makes STALE re-delivery a no-op: replaying
    # an older batch after a newer one must not close the current row at
    # a time before it opened (valid_to < valid_from would silently hide
    # the newest version from every as-of query).
    has_update = F.col(f"u.{eff_col}").isNotNull() & (
        F.col(f"u.{eff_col}") > F.col(f"h.{valid_from}")
    )
    changed = has_update & ~F.struct(
        *[F.col(f"h.{c}") for c in tracked]
    ).eqNullSafe(F.struct(*[F.col(f"u.{c}") for c in tracked]))
    j = open_rows.alias("h").join(
        up.alias("u"), on=[F.col(f"h.{k}") == F.col(f"u.{k}") for k in keys], how="left"
    )

    hist_cols = history.columns
    # open rows: keep as-is when no update or unchanged; close when changed
    kept_open = j.where(~changed).select(*[F.col(f"h.{c}") for c in hist_cols])
    newly_closed = (
        j.where(changed)
        .select(
            *[F.col(f"h.{c}") for c in hist_cols if c not in (valid_to, current_flag)],
            F.col(f"u.{eff_col}").alias(valid_to),
            F.lit(False).alias(current_flag),
        )
        .select(*hist_cols)
    )
    # untracked attribute columns (present in the history but neither key
    # nor tracked) carry through from the closing row; inserts get NULLs
    meta = {valid_from, valid_to, current_flag}
    untracked = [
        c for c in hist_cols if c not in keys and c not in tracked and c not in meta
    ]
    # new open versions for changed keys
    new_versions = (
        j.where(changed)
        .select(
            *[F.col(f"u.{k}") for k in keys],
            *[F.col(f"u.{c}") for c in tracked],
            *[F.col(f"h.{c}") for c in untracked],
            F.col(f"u.{eff_col}").alias(valid_from),
        )
    )
    # brand-new keys (no open row at all)
    inserts = up.alias("u").join(
        open_rows.alias("h"),
        on=[F.col(f"h.{k}") == F.col(f"u.{k}") for k in keys],
        how="left_anti",
    )
    inserts = inserts.select(
        *[F.col(k) for k in keys],
        *[F.col(c) for c in tracked],
        *[
            F.lit(None).cast(history.schema[c].dataType).alias(c)
            for c in untracked
        ],
        F.col(eff_col).alias(valid_from),
    )
    opened = (
        new_versions.unionByName(inserts)
        .withColumn(valid_to, F.lit(None).cast(history.schema[valid_to].dataType))
        .withColumn(current_flag, F.lit(True))
        .select(*hist_cols)
    )
    return closed_rows.unionByName(kept_open).unionByName(newly_closed).unionByName(opened)


def scd2_as_of(
    history: DataFrame,
    as_of,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time view: the version of each key valid at ``as_of``
    (a literal or Column) — ``valid_from <= as_of < valid_to`` with an
    open ``valid_to`` treated as infinity."""
    ts = F.lit(as_of)  # lit passes Column inputs through unchanged
    return history.where(
        (F.col(valid_from) <= ts)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > ts))
    )


def scd2_point_in_time(
    fact: DataFrame,
    history: DataFrame,
    on: Sequence[tuple[str, str]] | tuple[str, str],
    ts_col: str,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time enrichment: join each fact row to the dimension
    VERSION that was valid at the fact's event time — the whole reason
    an SCD2 history exists.  ``on`` is (fact_key, history_key) pairs;
    a fact row matches the history row with
    ``valid_from <= ts < valid_to`` (open rows: ``valid_to`` null).

    Plan shape: an EQUI-join on the dimension key with the validity
    window as a residual filter — Catalyst plans the hash/sort-merge
    join on the key (never a cartesian), and because SCD2 intervals for
    one key are disjoint by construction each fact row matches at most
    one version (no fan-out).  At 100 TB this is one shuffle on the
    dimension key, broadcast when the dimension is small."""
    pairs = [on] if isinstance(on[0], str) else [tuple(p) for p in on]
    cond = None
    for fk, hk in pairs:
        c = fact[fk] == history[hk]
        cond = c if cond is None else (cond & c)
    ts = fact[ts_col]
    cond = (
        cond
        & (ts >= history[valid_from])
        & (history[valid_to].isNull() | (ts < history[valid_to]))
    )
    return fact.join(history, cond, how)
