"""Filter / projection operators (SURVEY §2.2).

All functions are pure ``DataFrame -> DataFrame`` transformations built
from Catalyst-native predicates, so filters push down to the parquet scan
and never leave the JVM.  Callable predicates (the reference's escape
hatch) are accepted but documented as the slow path.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS: dict[str, Callable[[Column, Any], Column]] = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
}


def filter_df(
    df: DataFrame,
    column: str,
    operator: str | Callable[[Column], Column] = "==",
    value: Any = None,
    *,
    dropna: bool = False,
) -> DataFrame:
    """Single-predicate filter.

    Reference: ``filter_df`` (gofast/utils/data_utils.py:1187) — keeps rows
    where ``column <op> value``; op is one of ==,!=,>,<,>=,<= or a callable
    taking the column.  ``dropna`` drops NULLs in ``column`` first (pandas
    NaN semantics would exclude them anyway; Spark needs it explicit).

    Scale note: a comparison predicate on a parquet column compiles to a
    pushed filter (check ``PushedFilters`` in ``.explain``), so the scan
    skips row groups — this matters far more than the Python-side wrapper.
    """
    col = F.col(column)
    out = df.where(col.isNotNull()) if dropna else df
    if callable(operator) and not isinstance(operator, str):
        return out.where(operator(col))
    if operator not in _OPS:
        raise ValueError(f"unsupported operator {operator!r}")
    return out.where(_OPS[operator](col, value))


def group_and_filter(
    df: DataFrame,
    column: str,
    groups: Sequence[Any],
    *,
    conditions: dict[str, Callable[[Column], Column] | tuple[str, Any]] | None = None,
    sort_by: str | Sequence[str] | None = None,
    ascending: bool = True,
) -> DataFrame:
    """Membership filter + per-column conditions + sort.

    Reference: ``group_and_filter`` (gofast/dataops/transformation.py:548-651)
    — ``col.isin(groups)`` then ``df.query`` conditions then sort.  Here the
    conditions are AND-ed Catalyst predicates, so the whole thing is one
    pushed-down scan filter followed by a sort.
    """
    out = df.where(F.col(column).isin(list(groups)))
    for col_name, cond in (conditions or {}).items():
        c = F.col(col_name)
        if callable(cond):
            out = out.where(cond(c))
        else:
            op, v = cond
            out = out.where(_OPS[op](c, v))
    if sort_by:
        keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        out = out.orderBy(*[F.col(k).asc() if ascending else F.col(k).desc() for k in keys])
    return out


def filter_by_isin(
    df: DataFrame,
    main_col: str,
    others: Sequence[tuple[DataFrame, str]],
    *,
    mode: str = "union",
    invert: bool = False,
) -> DataFrame:
    """Keep rows whose ``main_col`` appears in other frames' columns.

    Reference: ``filter_by_isin`` (gofast/utils/data_utils.py:6597) — pandas
    collects the other columns into a set; at scale that is a broadcast-able
    **semi/anti join**, which is exactly what we emit.  ``mode`` is
    union/intersection of the other frames' value sets; ``invert`` flips to
    an anti join.

    Scale note: each ``(frame, col)`` contributes a distinct-projected side;
    Catalyst broadcasts it when small (BroadcastHashJoin + LeftSemi), else
    falls back to shuffled semi join — no driver-side ``collect``.
    """
    if not others:
        raise ValueError("need at least one (frame, column) pair")
    sets = [o.select(F.col(c).alias("__k")).distinct() for o, c in others]
    if mode == "union":
        keys = sets[0]
        for s in sets[1:]:
            keys = keys.unionByName(s)
        keys = keys.distinct()
    elif mode == "intersection":
        keys = sets[0]
        for s in sets[1:]:
            keys = keys.intersect(s)
    else:
        raise ValueError(f"mode must be union|intersection, got {mode!r}")
    how = "left_anti" if invert else "left_semi"
    return df.join(keys, on=df[main_col] == keys["__k"], how=how)


def mask_by_reference(
    df: DataFrame,
    ref_col: str,
    values: Sequence[Any],
    *,
    fill_value: Any = None,
    mask_columns: Sequence[str] | None = None,
) -> DataFrame:
    """Mask other columns where ``ref_col`` matches ``values``.

    Reference: ``mask_by_reference`` (gofast/utils/data_utils.py:6283).
    Implemented as per-column ``when(match, fill).otherwise(col)`` — a single
    projection, no shuffle.
    """
    match = F.col(ref_col).isin(list(values))
    targets = mask_columns or [c for c in df.columns if c != ref_col]
    exprs = []
    for c in df.columns:
        if c in targets:
            exprs.append(F.when(match, F.lit(fill_value)).otherwise(F.col(c)).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def filter_by_period(
    df: DataFrame,
    dt_col: str,
    periods: Sequence[str],
) -> DataFrame:
    """Keep rows whose datetime falls in the evaluated periods.

    Reference: ``filter_by_period`` (gofast/utils/ts_utils.py:52) — period
    strings at year (``'2024'``), month (``'2024-03'``) or day
    (``'2024-03-15'``) granularity, OR-ed together.  Compiles to
    date-function predicates that prune parquet partitions when the data is
    date-partitioned.
    """
    preds: list[Column] = []
    ts = F.col(dt_col)
    for p in periods:
        parts = str(p).split("-")
        cond = F.year(ts) == int(parts[0])
        if len(parts) >= 2:
            cond = cond & (F.month(ts) == int(parts[1]))
        if len(parts) >= 3:
            cond = cond & (F.dayofmonth(ts) == int(parts[2]))
        preds.append(cond)
    combined = preds[0]
    for p in preds[1:]:
        combined = combined | p
    return df.where(combined)


def pop_labels_in(df: DataFrame, column: str, labels: Sequence[Any]) -> DataFrame:
    """Remove rows whose label is in ``labels``.

    Reference: ``pop_labels_in`` (gofast/utils/data_utils.py:2926).
    """
    return df.where(~F.col(column).isin(list(labels)) | F.col(column).isNull())


def select_features(
    df: DataFrame,
    features: Sequence[str] | None = None,
    *,
    regex: str | None = None,
    include_dtypes: Sequence[str] | None = None,
    exclude_dtypes: Sequence[str] | None = None,
) -> DataFrame:
    """Projection by name list / regex / dtype include-exclude.

    Reference: ``select_features`` (gofast/utils/base_utils.py:2782).
    Pure ``select`` — Catalyst prunes the scan to exactly these columns.
    """
    cols = list(df.columns)
    if features is not None:
        missing = [f for f in features if f not in cols]
        if missing:
            raise KeyError(f"features not in frame: {missing}")
        keep = list(features)
    else:
        keep = cols
    if regex is not None:
        pat = re.compile(regex)
        keep = [c for c in keep if pat.search(c)]
    dtypes = dict(df.dtypes)
    if include_dtypes:
        keep = [c for c in keep if any(dtypes[c].startswith(t) for t in include_dtypes)]
    if exclude_dtypes:
        keep = [c for c in keep if not any(dtypes[c].startswith(t) for t in exclude_dtypes)]
    if not keep:
        raise ValueError("selection produced no columns")
    return df.select(*keep)
