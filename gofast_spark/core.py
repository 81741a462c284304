"""Fluent deferred-op facades: ``Data``, ``Frames``, ``MergeableFrames``,
``MergeableSeries`` (SURVEY §3.2).

The reference queues ``(callable, kwargs)`` pairs on a pandas frame and
``execute()`` folds them eagerly (gofast/dataops/core.py:31-171).  Spark's
DataFrame IS a deferred plan, so these facades simply compose
transformations — the queue the reference hand-rolls becomes Catalyst's
logical plan, which additionally reorders/fuses the steps (something the
reference's verbatim fold cannot do).  ``execute()`` returns the composed
DataFrame (still lazy; call an action to run).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Data:
    """Queued column/row operations on one frame
    (reference gofast/dataops/core.py:31-171, 89-157).

    Methods mirror the reference queue: ``rename``, ``drop``, ``filter``,
    ``sanitize``, ``drop_nan``, ``encode``; each returns ``self`` for
    chaining and ``execute()`` yields the composed DataFrame.
    """

    def __init__(self, df: DataFrame):
        self._df = df

    # -- queued ops --------------------------------------------------------

    def rename(self, mapping: dict[str, str]) -> "Data":
        self._df = self._df.withColumnsRenamed(mapping)
        return self

    def drop(self, columns: str | Sequence[str]) -> "Data":
        cols = [columns] if isinstance(columns, str) else list(columns)
        self._df = self._df.drop(*cols)
        return self

    def filter(self, condition: Column | str) -> "Data":
        self._df = self._df.where(condition)
        return self

    def sanitize(self) -> "Data":
        from gofast_spark.sources.io import sanitize_columns

        self._df = sanitize_columns(self._df)
        return self

    def drop_nan(self, columns: Sequence[str] | None = None) -> "Data":
        from gofast_spark.quality.missing import drop_nan_in

        self._df = drop_nan_in(self._df, columns or self._df.columns)
        return self

    def encode(self, columns: str | Sequence[str]) -> "Data":
        from gofast_spark.functions import label_encode

        cols = [columns] if isinstance(columns, str) else list(columns)
        for c in cols:
            self._df = label_encode(self._df, c)
        return self

    def shrunk(self, n: int = 5) -> "Data":
        self._df = self._df.limit(n)
        return self

    # -- terminals ---------------------------------------------------------

    def describe(self) -> DataFrame:
        from gofast_spark.stats import describe

        num = [c for c, t in self._df.dtypes if t in ("double", "float", "int", "bigint")]
        return describe(self._df, num)

    def execute(self) -> DataFrame:
        return self._df


class Frames:
    """Queued multi-frame operations
    (reference gofast/dataops/core.py:545-680)."""

    def __init__(self, frames: Sequence[DataFrame]):
        self._frames = list(frames)
        self._result: DataFrame | None = None

    def merge(self, on: str | Sequence[str], how: str = "inner") -> "Frames":
        from gofast_spark.operators import merge_frames

        self._result = merge_frames(self._frames, on=on, how=how)
        return self

    def concat(self) -> "Frames":
        from gofast_spark.operators import concat_frames

        self._result = concat_frames(self._frames, axis=0)
        return self

    def conditional_filter(
        self, conditions: dict[str, Callable[[Column], Column]]
    ) -> "Frames":
        base = self._result if self._result is not None else self._frames[0]
        for c, fn in conditions.items():
            base = base.where(fn(F.col(c)))
        self._result = base
        return self

    def compare(self) -> bool:
        """All frames equal as multisets (reference ``compare``,
        gofast/dataops/core.py:644-654)."""
        first = self._frames[0]
        for other in self._frames[1:]:
            if first.exceptAll(other).limit(1).count() > 0:
                return False
            if other.exceptAll(first).limit(1).count() > 0:
                return False
        return True

    def add(self, on: str | Sequence[str]) -> "Frames":
        """Element-wise add of numeric columns across frames joined on a
        key, NULL treated as 0 (reference ``add``,
        gofast/dataops/core.py:656-665 — index-aligned add; Spark needs
        the explicit key)."""
        keys = [on] if isinstance(on, str) else list(on)

        def add2(a: DataFrame, b: DataFrame) -> DataFrame:
            num = [
                c for c, t in a.dtypes
                if c not in keys and t in ("double", "float", "int", "bigint")
                and c in b.columns
            ]
            bb = b.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in num])
            out = a.join(bb, on=keys, how="outer")
            for c in num:
                out = out.withColumn(
                    c,
                    F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"__b_{c}"), F.lit(0)),
                ).drop(f"__b_{c}")
            return out

        self._result = reduce(add2, self._frames)
        return self

    def execute(self) -> DataFrame:
        if self._result is None:
            raise ValueError("no operation queued; call merge/concat/add first")
        return self._result


class MergeableSeries:
    """Deferred boolean algebra over a Column
    (reference gofast/dataops/core.py:439-474): ``a & b`` / ``a | b``
    compose predicates lazily; ``execute()`` returns the Column."""

    def __init__(self, col: Column):
        self._col = col

    def __and__(self, other: "MergeableSeries") -> "MergeableSeries":
        return MergeableSeries(self._col & other._col)

    def __or__(self, other: "MergeableSeries") -> "MergeableSeries":
        return MergeableSeries(self._col | other._col)

    def __invert__(self) -> "MergeableSeries":
        return MergeableSeries(~self._col)

    def execute(self) -> Column:
        return self._col


class MergeableFrames:
    """Element-wise boolean AND/OR of same-schema boolean frames joined on
    a key (reference gofast/dataops/core.py:766-818)."""

    def __init__(self, df: DataFrame, *, key: str | Sequence[str]):
        self._df = df
        self._key = [key] if isinstance(key, str) else list(key)

    def _combine(self, other: "MergeableFrames", op) -> "MergeableFrames":
        keys = self._key
        cols = [c for c in self._df.columns if c not in keys]
        ob = other._df.select(
            *keys, *[F.col(c).alias(f"__o_{c}") for c in cols]
        )
        out = self._df.join(ob, on=keys, how="inner")
        for c in cols:
            out = out.withColumn(c, op(F.col(c), F.col(f"__o_{c}"))).drop(f"__o_{c}")
        return MergeableFrames(out, key=keys)

    def __and__(self, other: "MergeableFrames") -> "MergeableFrames":
        return self._combine(other, lambda a, b: a & b)

    def __or__(self, other: "MergeableFrames") -> "MergeableFrames":
        return self._combine(other, lambda a, b: a | b)

    def execute(self) -> DataFrame:
        return self._df
