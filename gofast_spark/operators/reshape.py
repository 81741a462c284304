"""Set operations / reshape (SURVEY §2.7)."""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_wide(
    df: DataFrame,
    index: str | Sequence[str],
    pivot_col: str,
    value_col: str,
    *,
    aggfunc: str = "first",
    values: Sequence[Any] | None = None,
    prefix: str = "",
) -> DataFrame:
    """Long -> wide pivot.

    Reference: ``to_wide`` (gofast/utils/data_utils.py:4762).

    Scale note: pass ``values`` (the distinct pivot values) when known — it
    skips Spark's extra distinct-collect job over the full table and bounds
    the output width explicitly.
    """
    from gofast_spark.operators.aggregations import _AGG_FNS

    idx = [index] if isinstance(index, str) else list(index)
    if aggfunc not in _AGG_FNS:
        raise ValueError(f"unsupported aggfunc {aggfunc!r}")
    g = df.groupBy(*idx)
    p = g.pivot(pivot_col, list(values)) if values is not None else g.pivot(pivot_col)
    out = p.agg(_AGG_FNS[aggfunc](value_col))
    if prefix:
        out = out.toDF(*idx, *[f"{prefix}{c}" for c in out.columns[len(idx):]])
    return out


def to_long(
    df: DataFrame,
    id_vars: str | Sequence[str],
    value_vars: Sequence[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long melt.

    Reference: ``to_long`` (gofast/utils/data_utils.py:4979).  Uses Spark's
    native ``unpivot`` (no shuffle — a generator projection).
    """
    ids = [id_vars] if isinstance(id_vars, str) else list(id_vars)
    return df.unpivot(ids, list(value_vars), var_name, value_name)


def concat_frames(
    frames: Sequence[DataFrame],
    *,
    axis: int = 0,
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Vertical (axis=0) or key-joined horizontal (axis=1) concat.

    Reference: ``Frames.concat`` (gofast/dataops/core.py:579-586, 635-642).
    axis=1 requires explicit join ``keys`` — pandas aligns on the row index,
    which Spark does not have (SURVEY §7.3.1).
    """
    if axis == 0:
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out
    if not keys:
        raise ValueError("axis=1 concat requires explicit join keys")
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, on=list(keys), how="outer")
    return out


def compare_frames(a: DataFrame, b: DataFrame) -> bool:
    """Multiset equality of two frames.

    Reference: ``Frames.compare`` (gofast/dataops/core.py:588-591, 644-654).
    """
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def add_frames(
    a: DataFrame, b: DataFrame, on: str | Sequence[str], *, fill_value: float = 0.0
) -> DataFrame:
    """Element-wise add of numeric columns aligned on key(s).

    Reference: ``Frames.add`` (gofast/dataops/core.py:593-596, 656-665) —
    pandas aligns on index with fill_value=0; we align on explicit keys via
    full outer join + coalesce.
    """
    keys = [on] if isinstance(on, str) else list(on)
    num = [c for c, t in a.dtypes if c not in keys and t in ("int", "bigint", "double", "float")]
    shared = [c for c in num if c in b.columns]
    aa = a.select(*keys, *[F.col(c).alias(f"__a_{c}") for c in shared])
    bb = b.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in shared])
    j = aa.join(bb, on=keys, how="outer")
    exprs = [F.col(k) for k in keys] + [
        (
            F.coalesce(F.col(f"__a_{c}"), F.lit(fill_value))
            + F.coalesce(F.col(f"__b_{c}"), F.lit(fill_value))
        ).alias(c)
        for c in shared
    ]
    return j.select(*exprs)


def find_intersection(a: DataFrame, b: DataFrame, column: str) -> DataFrame:
    """Distinct values of ``column`` present in both frames.

    Reference: ``find_intersection`` (gofast/utils/base_utils.py:4340).
    """
    return a.select(column).intersect(b.select(column))


def find_unique_elements(a: DataFrame, b: DataFrame, column: str) -> DataFrame:
    """Distinct values of ``column`` in ``a`` but not ``b``.

    Reference: ``find_unique_elements`` (gofast/utils/base_utils.py:4379).
    """
    return a.select(column).distinct().exceptAll(b.select(column).distinct())


def frame_union(
    frames: Sequence[DataFrame], on: str | Sequence[str]
) -> DataFrame:
    """Column-wise feature union of transformer outputs joined on key(s).

    Reference: ``FrameUnion``/``FrameUnionFlex``
    (gofast/transformers/feature_engineering.py:3525, 3318) — sklearn
    FeatureUnion over frames; pandas concats on the index, we join on the
    explicit key.  Duplicate non-key names get positional suffixes.
    """
    keys = [on] if isinstance(on, str) else list(on)
    out = frames[0]
    seen = set(out.columns)
    for i, f in enumerate(frames[1:], start=1):
        renames = {
            c: f"{c}_{i}" for c in f.columns if c not in keys and c in seen
        }
        ff = f.withColumnsRenamed(renames) if renames else f
        seen |= set(ff.columns)
        out = out.join(ff, on=keys, how="outer")
    return out


def repeat_feature_accross(
    df: DataFrame,
    feature_df: DataFrame,
    *,
    spine_col: str,
) -> DataFrame:
    """Replicate feature rows across every value of a spine (e.g. copy a
    static site profile across all years).

    Reference: ``repeat_feature_accross`` (gofast/utils/data_utils.py:5197).
    Implemented as a broadcast cross join with the distinct spine — the
    feature table is the small side, so the plan is a broadcast
    nested-loop with no shuffle of the spine.
    """
    spine = df.select(spine_col).distinct()
    return spine.crossJoin(F.broadcast(feature_df))


def swap_ic(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Swap index/column naming conventions via a rename map.

    Reference: ``swap_ic`` (gofast/utils/data_utils.py:5543) — pandas
    index/columns convention swaps; Spark has no index, so the operation
    reduces to renames (the explicit-key policy, SURVEY §1.3).
    """
    return df.withColumnsRenamed(mapping)


def generate_comparison(
    a: DataFrame, b: DataFrame, on: str | Sequence[str], columns: Sequence[str]
) -> DataFrame:
    """Align two frames on keys and diff the named columns.

    Reference: ``generate_comparison`` (gofast/utils/data_utils.py:647).
    Output: keys + ``{col}_left`` / ``{col}_right`` / ``{col}_equal``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    aa = a.select(*keys, *[F.col(c).alias(f"{c}_left") for c in columns])
    bb = b.select(*keys, *[F.col(c).alias(f"{c}_right") for c in columns])
    j = aa.join(bb, on=keys, how="full_outer")
    for c in columns:
        j = j.withColumn(
            f"{c}_equal", F.col(f"{c}_left").eqNullSafe(F.col(f"{c}_right"))
        )
    return j
