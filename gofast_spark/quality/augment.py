"""Row replication / augmentation / noise injection (SURVEY §2.8).

Reference: ``replace_data`` (gofast/utils/data_utils.py:4642),
``augment_data`` (gofast/dataops/preprocessing.py:3083),
``add_noises_to`` (gofast/core/handlers.py:1531).

Replication is a crossJoin with a tiny ``spark.range`` spine (n copies —
the range side is broadcast, so the fact table never shuffles); noise is
``randn/rand`` column arithmetic.  Seeded noise is deterministic given a
fixed partitioning (SURVEY §7.3.4 determinism contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replace_data(
    df: DataFrame,
    n: int,
    *,
    copy_col: str = "copy_id",
    noise_std: float = 0.0,
    noise_cols: Sequence[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Duplicate every row ``n`` times, optionally perturbing numeric
    columns with gaussian noise (replace_data,
    gofast/utils/data_utils.py:4642)."""
    spine = df.sparkSession.range(n).select(F.col("id").alias(copy_col))
    out = df.crossJoin(F.broadcast(spine))
    if noise_std:
        # seed+i: each column gets an independent noise draw (a shared seed
        # would give every column the identical perturbation per row)
        for i, c in enumerate(noise_cols or []):
            out = out.withColumn(c, F.col(c) + F.randn(seed + i) * noise_std)
    return out


def augment_data(
    df: DataFrame,
    *,
    fraction: float = 0.5,
    noise_std: float = 0.01,
    noise_cols: Sequence[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Append a sampled, noise-perturbed bootstrap of the frame
    (augment_data, gofast/dataops/preprocessing.py:3083): original rows
    plus ``fraction`` resampled rows with gaussian jitter."""
    extra = df.sample(withReplacement=True, fraction=fraction, seed=seed)
    cols = noise_cols or [c for c, t in df.dtypes if t in ("double", "float")]
    # seed+i as in add_noises_to: independent per-column draws
    for i, c in enumerate(cols):
        extra = extra.withColumn(c, F.col(c) + F.randn(seed + i) * noise_std)
    return df.unionByName(extra)


def add_noises_to(
    df: DataFrame,
    columns: Sequence[str],
    *,
    noise: str = "gaussian",
    scale: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Add gaussian/uniform noise to columns (add_noises_to,
    gofast/core/handlers.py:1531)."""
    out = df
    for i, c in enumerate(columns):
        if noise == "gaussian":
            eps = F.randn(seed + i) * scale
        elif noise == "uniform":
            eps = (F.rand(seed + i) - 0.5) * 2 * scale
        else:
            raise ValueError(f"unsupported noise {noise!r}")
        out = out.withColumn(c, F.col(c) + eps)
    return out


def nan_to_na(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Normalize float NaN to SQL NULL (nan_to_na,
    gofast/utils/data_utils.py:3086) — the NaN-vs-NULL policy boundary
    (SURVEY §7.3.2): downstream ops then only need NULL handling."""
    cols = columns or [c for c, t in df.dtypes if t in ("double", "float")]
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(F.isnan(F.col(c)), None).otherwise(F.col(c))
        )
    return out


def cleaner(
    df: DataFrame,
    *,
    columns: Sequence[str] | None = None,
    mode: str = "keep",
    sanitize_names: bool = True,
) -> DataFrame:
    """Column keep/drop + name sanitation (cleaner,
    gofast/utils/data_utils.py:4293)."""
    out = df
    if columns:
        out = out.select(*columns) if mode == "keep" else out.drop(*columns)
    if sanitize_names:
        from gofast_spark.sources.io import sanitize_columns

        out = sanitize_columns(out)
    return out


def drop_correlated_features(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    threshold: float = 0.9,
) -> DataFrame:
    """Drop one column of every pair correlated above ``threshold``
    (drop_correlated_features, gofast/dataops/quality.py:4054).

    One aggregation computes all pairwise correlations (corr_matrix);
    the greedy pick — keep the earlier column, drop the later — runs on
    the driver over the tiny pair list, then a single ``drop``.
    """
    from gofast_spark.stats import corr_matrix

    cols = list(
        columns
        or [c for c, t in df.dtypes if t in ("double", "float", "int", "bigint")]
    )
    pairs = corr_matrix(df, cols).collect()
    dropped: set[str] = set()
    for r in pairs:
        a, b, c = r["col_a"], r["col_b"], r["corr"]
        if c is not None and abs(c) > threshold and a not in dropped:
            dropped.add(b)
    return df.drop(*dropped)


def inspect_data(df: DataFrame) -> DataFrame:
    """Per-column profile: dtype, missing count/ratio, distinct count,
    min/max (as strings for heterogenous types).

    Reference: ``inspect_data`` (gofast/dataops/inspection.py:257).
    ONE aggregation pass over all columns.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("bigint")).alias(f"__m_{c}"),
            F.countDistinct(col).alias(f"__d_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    dtypes = dict(df.dtypes)
    stacked = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col(f"__m_{c}").cast("bigint").alias("n_missing"),
            (F.col(f"__m_{c}") / F.col("__n")).alias("missing_ratio"),
            F.col(f"__d_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in df.columns
    ]
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")
