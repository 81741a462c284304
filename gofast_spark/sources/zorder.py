"""Z-order (Morton) clustering for multi-column data skipping.

Parquet min/max skipping only prunes on the column the files are sorted
by; sorting on a Morton interleave of SEVERAL columns keeps files tight
in every interleaved dimension at once, so range predicates on any of
them skip most files.  This is write-time layout — pure Spark, no table
format required: compute the z-value, range-repartition + sort on it,
write.

All bit manipulation is codegen'd column expressions (shiftleft / or
over a Python-unrolled loop — no UDF).  Inputs must first be mapped to
unsigned ints in ``[0, 2^bits)``; ``rank_normalize`` does that with an
``ntile`` over each column (rank-space normalization also equalizes
skewed distributions, which raw min/max scaling would not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: Sequence[Column | str], *, bits: int = 16) -> Column:
    """Morton-interleave ``len(cols)`` unsigned-int columns of ``bits``
    bits each into one long (bit j of column i lands at position
    ``j * n + i``).  Total bits must fit a signed 64-bit long."""
    n = len(cols)
    if n < 2:
        raise ValueError("interleave_bits needs at least two columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def rank_normalize(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 16,
    relative_error: float | None = None,
) -> DataFrame:
    """Map each column to ``[0, 2^bits)`` by rank — appended as
    ``__zn_<col>``.  Rank space equalizes skew (raw min/max scaling
    would waste most of the grid on outliers).

    Distributed: bucket boundaries come from a one-pass Greenwald-Khanna
    quantile sketch (``approxQuantile`` — only the cutpoints reach the
    driver) and each row maps through a ``Bucketizer`` binary search —
    never a no-partition ``ntile`` window, which would funnel the whole
    table through one task per column (the exact pathology
    operators/prefix.py exists to avoid).  Skew-collapsed (duplicate)
    cutpoints merge, yielding coarser but still order-preserving
    buckets."""
    from pyspark.ml.feature import Bucketizer

    n_buckets = 1 << bits
    rel = relative_error if relative_error is not None else max(
        1e-6, 0.25 / n_buckets
    )
    out = df
    for c in cols:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = sorted(
            {float(x) for x in df.approxQuantile(c, probs, rel)}
        )
        splits = [float("-inf"), *cuts, float("inf")]
        tmp_in = f"__zin_{c}"
        staged = out.withColumn(tmp_in, F.col(c).cast("double"))
        b = Bucketizer(
            splits=splits, inputCol=tmp_in, outputCol=f"__zd_{c}"
        )
        out = (
            b.transform(staged)
            .withColumn(f"__zn_{c}", F.col(f"__zd_{c}").cast("long"))
            .drop(tmp_in, f"__zd_{c}")
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 12,
    num_files: int | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Morton order of ``cols``: rank
    normalize, interleave, range-repartition on the z-value (parallel
    sampled sort), sort within partitions, drop the helper columns."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    z = rank_normalize(df, list(cols), bits=bits).withColumn(
        "__z", interleave_bits([f"__zn_{c}" for c in cols], bits=bits)
    )
    out = (
        z.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__zn_{c}" for c in cols])
    )
    out.write.format(format).mode(mode).save(path)
