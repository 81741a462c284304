"""Binning and categorical encoding.

Reference: ``to_categories`` (gofast/utils/data_utils.py:5927),
``CategoryFrequencyEncoder`` (gofast/transformers/feature_engineering.py:4287),
``Target.label_encode/one_hot_encode`` (gofast/dataops/preprocessing.py:128,
169).  Two-pass Estimator shape: a tiny stats aggregate (min/max, distinct
values, frequencies) feeds a broadcast-joined or inlined transform — the
big table is touched once and never sorted globally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_categories(
    df: DataFrame,
    column: str,
    *,
    k: int = 5,
    method: str = "equal_range",
    out_col: str | None = None,
    label_col: str | None = None,
) -> DataFrame:
    """Bin a continuous column into ``k`` categories
    (gofast/utils/data_utils.py:5927).

    ``equal_range``: bucket ``i = min(floor((x - min) / width), k-1)`` from
    a one-row min/max aggregate (driver literals — the Estimator's "fit").
    ``quantile``: edges from ``approxQuantile`` (sketch-based, one pass —
    the 100 TB-safe choice).  Auto labels mirror the reference:
    ``'< a'``, ``'a-b'``, ..., ``'>= c'`` with edges rounded to 1 decimal.
    """
    oc = out_col or f"{column}_bin"
    lc = label_col or f"{column}_cat"
    x = F.col(column)
    if method == "equal_range":
        lo, hi = df.agg(F.min(x), F.max(x)).first()
        lo, hi = float(lo), float(hi)
        # constant column: zero range would make (x-lo)/width NaN/Inf
        # (ANSI floor then errors); any positive width puts every row
        # in bucket 0, which is the only sensible answer.  Guard BOTH
        # levels: the range (matching the sibling binning guards in
        # operators/checks.py / stats/descriptive.py) AND the
        # quotient — a denormal nonzero range is truthy yet its /k
        # quotient can still underflow to exactly 0.0
        width = (((hi - lo) or 1.0) / k) or 1.0
        bucket = F.least(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(k - 1))
        edges = [lo + width * i for i in range(1, k)]
    elif method == "quantile":
        edges = df.approxQuantile(column, [i / k for i in range(1, k)], 1e-4)
        bucket = F.lit(0)
        for e in edges:
            bucket = bucket + (x >= F.lit(e)).cast("int")
    else:
        raise ValueError(f"unsupported method {method!r}")
    labels = (
        [f"< {edges[0]:.1f}"]
        + [f"{a:.1f}-{b:.1f}" for a, b in zip(edges[:-1], edges[1:])]
        + [f">= {edges[-1]:.1f}"]
    )
    label = F.element_at(F.array(*[F.lit(s) for s in labels]), bucket.cast("int") + 1)
    return df.withColumn(oc, bucket.cast("int")).withColumn(lc, label)


def freq_encode(
    df: DataFrame, column: str, *, out_col: str | None = None
) -> DataFrame:
    """Replace/augment a categorical with its frequency count
    (CategoryFrequencyEncoder, feature_engineering.py:4287).  The counts
    frame has one row per distinct value — broadcast back onto the big
    table, so the only shuffle is the map-side-combined count."""
    oc = out_col or f"{column}_freq"
    counts = df.groupBy(column).agg(F.count(F.lit(1)).alias(oc))
    return df.join(F.broadcast(counts), on=column, how="left")


def label_encode(
    df: DataFrame, column: str, *, out_col: str | None = None
) -> DataFrame:
    """Deterministic integer ids by sorted value order
    (Target.label_encode, gofast/dataops/preprocessing.py:128; sklearn
    LabelEncoder semantics: ids follow lexicographic order).

    The global sort runs on the *distinct values only* (tiny), then
    broadcast-joins back — never a global sort of the data.
    """
    from pyspark.sql import Window

    oc = out_col or f"{column}_id"
    vals = (
        df.select(column)
        .distinct()
        .withColumn(
            oc,
            F.dense_rank().over(Window.orderBy(F.col(column))) - 1,
        )
    )
    return df.join(F.broadcast(vals), on=column, how="left")


def map_values(
    df: DataFrame,
    column: str,
    mapping: dict,
    *,
    default=None,
    out_col: str | None = None,
) -> DataFrame:
    """Dictionary remap of a column (map_values,
    gofast/utils/base_utils.py:78) — a literal ``create_map`` lookup
    evaluated inline (codegen'd), with an optional default for unmapped
    values."""
    oc = out_col or column
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    looked = m.getItem(F.col(column))
    if default is not None:
        looked = F.coalesce(looked, F.lit(default))
    return df.withColumn(oc, looked)


def binarize(
    df: DataFrame, column: str, threshold: float, *, out_col: str | None = None
) -> DataFrame:
    """0/1 threshold indicator (Target.binarize,
    gofast/dataops/preprocessing.py:265)."""
    oc = out_col or f"{column}_bin"
    return df.withColumn(oc, (F.col(column) > threshold).cast("int"))


def handle_categorical_features(
    df: DataFrame,
    *,
    max_unique: int = 10,
    exclude: Sequence[str] = (),
) -> DataFrame:
    """Cast low-cardinality numeric columns to string categories
    (handle_categorical_features, gofast/dataops/quality.py:325).

    One approx-distinct aggregate decides which columns flip (HyperLogLog
    — exactness is irrelevant at a 10-ish threshold); the cast itself is
    a lazy projection.
    """
    num = [
        c for c, t in df.dtypes
        if t in ("int", "bigint", "smallint") and c not in exclude
    ]
    if not num:
        return df
    row = df.agg(
        *[F.approx_count_distinct(F.col(c)).alias(c) for c in num]
    ).first()
    flip = [c for c in num if (row[c] or 0) <= max_unique]
    out = df
    for c in flip:
        out = out.withColumn(c, F.col(c).cast("string"))
    return out


def one_hot_encode(
    df: DataFrame,
    column: str,
    values: Sequence[str] | None = None,
    *,
    prefix: str | None = None,
) -> DataFrame:
    """0/1 indicator columns per category value
    (Target.one_hot_encode, gofast/dataops/preprocessing.py:169).
    ``values`` pins the category set (deterministic schema — required for
    streaming / incremental runs); inferred from the data when omitted.
    """
    p = prefix or column
    if values is None:
        values = [
            r[0] for r in df.select(column).distinct().orderBy(column).collect()
        ]
    cols = {
        f"{p}_{v}": (F.col(column) == F.lit(v)).cast("int") for v in values
    }
    return df.withColumns(cols)
