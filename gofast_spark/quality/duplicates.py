"""Duplicate handling (SURVEY §2.8)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def handle_duplicates(
    df: DataFrame,
    operation: str = "drop",
    *,
    subset: Sequence[str] | None = None,
) -> DataFrame:
    """Return / mark / drop duplicate rows.

    Reference: ``handle_duplicates`` (gofast/dataops/quality.py:4677).

    - ``drop``: ``dropDuplicates`` (hash-aggregate; map-side partial dedup
      before the shuffle, so it scales to the full table).
    - ``mark``: windowed count over the key columns — adds ``is_duplicate``.
    - ``return``: only the rows that have at least one duplicate.
    """
    keys = list(subset) if subset else list(df.columns)
    if operation == "drop":
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys)
    marked = df.withColumn("__n", F.count(F.lit(1)).over(w))
    if operation == "mark":
        return marked.withColumn("is_duplicate", F.col("__n") > 1).drop("__n")
    if operation == "return":
        return marked.where(F.col("__n") > 1).drop("__n")
    raise ValueError(f"unsupported operation {operation!r}")


def handle_unique_identifiers(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    action: str = "drop",
    transform_func=None,
    transform_is_expr: bool | None = None,
    approx: bool = True,
) -> DataFrame:
    """Drop columns whose uniqueness ratio exceeds ``threshold``.

    Reference: ``handle_unique_identifiers`` (gofast/dataops/management.py:41).

    Scale note: uses HyperLogLog ``approx_count_distinct`` by default — an
    ID-like column is ID-like whether the ratio is 0.95 or 0.9503; the
    exact path exists for parity testing.
    """
    fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        fn(F.col(c)).alias(c) for c in df.columns
    ]
    row = df.agg(*aggs).first()
    n = row["__n"] or 1
    idlike = [c for c in df.columns if (row[c] or 0) / n > threshold]
    if action == "drop":
        return df.drop(*idlike)
    if action == "transform":
        # the reference applies a caller-supplied python function to each
        # ID-like column; a plain Python UDF would be the row-at-a-time
        # slow path, so accept either a Column-expression builder
        # (preferred — stays in codegen) or fall back to a pandas_udf
        # wrapping the scalar callable (Arrow-batched).
        #
        # ``transform_is_expr`` disambiguates explicitly: True = Column
        # builder, False = scalar callable.  The default (None) probes by
        # calling with a Column — ambiguous for callables that happen to
        # accept a Column (e.g. ``lambda x: x + 1`` builds a Column
        # expression even if the caller meant python-scalar semantics);
        # pass the flag when the two interpretations differ.
        if transform_func is None:
            raise ValueError("action='transform' needs transform_func")
        from pyspark.sql import Column

        out = df
        for c in idlike:
            if transform_is_expr is True:
                probe = transform_func(F.col(c))
                if not isinstance(probe, Column):
                    raise TypeError(
                        "transform_is_expr=True but transform_func did "
                        "not return a Column"
                    )
            elif transform_is_expr is False:
                probe = None
            else:
                try:
                    probe = transform_func(F.col(c))
                except Exception:  # scalar-only callable (e.g. str slicing)
                    probe = None
            if isinstance(probe, Column):
                out = out.withColumn(c, probe)
            else:  # scalar python callable -> Arrow-batched fallback
                from pyspark.sql.functions import pandas_udf

                dt = df.schema[c].dataType.simpleString()

                def _mk(fn):
                    def apply_series(s):
                        return s.map(fn)

                    return apply_series

                out = out.withColumn(
                    c, pandas_udf(_mk(transform_func), dt)(F.col(c))
                )
        return out
    raise ValueError(f"unsupported action {action!r}")


def has_duplicates(
    df: DataFrame, *, subset: Sequence[str] | None = None
) -> bool:
    """True if any key combination occurs more than once.

    Reference: the duplicate-existence probe of ``handle_duplicates``
    (gofast/dataops/quality.py:4677).  One hash-aggregate with an
    early-exit ``limit(1)`` — the scan stops at the first duplicate group
    found instead of counting them all (vs the naive
    ``count() != dropDuplicates().count()`` double scan).
    """
    keys = list(subset) if subset else list(df.columns)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .limit(1)
        .count()
        > 0
    )
