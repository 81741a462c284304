"""Relationship analysis (SURVEY §2.10): rank correlations, rank-based
tests, thresholded correlation extraction.

Reference: ``correlation`` (gofast/stats/relationships.py:32),
``optimized_spearmanr`` (gofast/utils/mathext.py:3063),
``kruskal_wallis_test`` (gofast/stats/inferential.py:1039),
``correlation_ops`` (gofast/dataops/quality.py:3845).

Rank assignment uses average ranks (scipy convention) built from
``rank() + (ties-1)/2`` windows.  Scale note: ranking is a global sort of
the *ranked column* — pre-bin (quantile sketch) for 100 TB inputs, or
rank within partitions when the statistic is per-group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _avg_rank(col: Column) -> Column:
    """Average (midrank) of a value: min rank + (ties - 1)/2."""
    w = Window.orderBy(col.asc())
    ties = Window.partitionBy(col)
    return F.rank().over(w) + (F.count(F.lit(1)).over(ties) - 1) / 2.0


def spearman_corr(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Spearman rho = Pearson correlation of average ranks
    (optimized_spearmanr, gofast/utils/mathext.py:3063)."""
    ranked = df.select(
        _avg_rank(F.col(col_a)).alias("__ra"),
        _avg_rank(F.col(col_b)).alias("__rb"),
    )
    return ranked.agg(F.corr("__ra", "__rb").alias("spearman"))


def kruskal_wallis(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Kruskal-Wallis H (no tie correction; document when data is heavily
    tied) from per-group rank sums:
    ``H = 12/(N(N+1)) * sum(R_g^2 / n_g) - 3(N+1)``
    (gofast/stats/inferential.py:1039)."""
    ranked = df.select(
        F.col(group_col).alias("__g"), _avg_rank(F.col(value_col)).alias("__r")
    )
    per_g = ranked.groupBy("__g").agg(
        F.sum("__r").alias("rsum"), F.count(F.lit(1)).alias("n")
    )
    stats = per_g.agg(
        F.sum(F.col("rsum") * F.col("rsum") / F.col("n")).alias("s"),
        F.sum("n").alias("N"),
        F.count(F.lit(1)).alias("k"),
    )
    h = 12.0 / (F.col("N") * (F.col("N") + 1)) * F.col("s") - 3.0 * (F.col("N") + 1)
    return stats.select(
        h.alias("h_stat"),
        (F.col("k") - 1).cast("bigint").alias("dof"),
        F.col("N").cast("bigint").alias("n"),
    )


def correlation_ops(
    df: DataFrame,
    columns: Sequence[str],
    *,
    threshold: float = 0.5,
    op: str = "strong",
) -> DataFrame:
    """Extract correlated pairs above/below a threshold from the one-pass
    correlation matrix (correlation_ops, gofast/dataops/quality.py:3845).

    op='strong' keeps |corr| >= threshold; 'weak' keeps |corr| <
    threshold.
    """
    from gofast_spark.stats.descriptive import corr_matrix

    m = corr_matrix(df, columns)
    a = F.abs(F.col("corr"))
    if op == "strong":
        return m.where(a >= threshold)
    if op == "weak":
        return m.where(a < threshold)
    raise ValueError(f"unsupported op {op!r}")
