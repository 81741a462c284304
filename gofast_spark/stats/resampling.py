"""Resampling statistics: distributed bootstrap.

Reference: ``bootstrap`` (gofast/stats/inferential.py:1713) draws ``n``
with-replacement resamples of an in-memory array and evaluates a statistic
on each.  At 100 TB you cannot materialize one resample, let alone 1000 —
the scalable re-expression is the **Poisson bootstrap** (the standard
large-scale variant: for N large, each row's multiplicity in a resample is
~Poisson(1), independent across rows).  Each partition draws, for every
row, one Poisson(1) weight per replicate with numpy (vectorized, one Arrow
batch in and one tiny partial-sums frame out), emits per-replicate partial
moments, and a single groupBy(replicate) reduce assembles the statistic —
total shuffled data is ``n_replicates x n_partitions`` rows regardless of
input size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bootstrap(
    df: DataFrame,
    value_col: str,
    *,
    n: int = 200,
    statistic: str = "mean",
    seed: int = 42,
) -> DataFrame:
    """Poisson-bootstrap distribution of ``statistic`` over ``value_col``.

    Returns a small DataFrame (replicate bigint, stat double) with one row
    per bootstrap replicate.  ``statistic``: 'mean', 'sum', or 'std'
    (population std of the weighted resample).  Deterministic for a fixed
    input partitioning: partition ``p`` seeds numpy with ``seed * 100003 +
    p``.
    """
    if statistic not in ("mean", "sum", "std"):
        raise ValueError(f"unsupported statistic {statistic!r}")
    src = df.select(F.col(value_col).cast("double").alias("x")).na.drop()

    def partials(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rng = np.random.default_rng(seed * 100003 + pid)
        acc_w = np.zeros(n)
        acc_wx = np.zeros(n)
        acc_wx2 = np.zeros(n)
        for pdf in batches:
            x = pdf["x"].to_numpy(dtype=float)
            if len(x) == 0:
                continue
            # (rows x replicates) Poisson(1) weights, reduced immediately
            w = rng.poisson(1.0, size=(len(x), n))
            acc_w += w.sum(axis=0)
            acc_wx += x @ w
            acc_wx2 += (x * x) @ w
        yield pd.DataFrame(
            {
                "replicate": np.arange(n, dtype="int64"),
                "w": acc_w,
                "wx": acc_wx,
                "wx2": acc_wx2,
            }
        )

    parts = src.mapInPandas(
        partials, schema="replicate bigint, w double, wx double, wx2 double"
    )
    agg = parts.groupBy("replicate").agg(
        F.sum("w").alias("w"),
        F.sum("wx").alias("wx"),
        F.sum("wx2").alias("wx2"),
    )
    if statistic == "sum":
        stat = F.col("wx")
    elif statistic == "mean":
        stat = F.col("wx") / F.col("w")
    else:  # std
        mean = F.col("wx") / F.col("w")
        stat = F.sqrt(F.col("wx2") / F.col("w") - mean * mean)
    return agg.select("replicate", stat.alias("stat"))


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    *,
    n: int = 200,
    statistic: str = "mean",
    ci: float = 0.95,
    seed: int = 42,
) -> tuple[float, float]:
    """Percentile confidence interval from the bootstrap distribution
    (reference ``bootstrap(return_ci=True)``).  Collects only the ``n``
    replicate statistics — bounded by contract."""
    import numpy as np

    stats = np.array(
        [
            r["stat"]
            for r in bootstrap(
                df, value_col, n=n, statistic=statistic, seed=seed
            ).collect()
        ]
    )
    lo = (1.0 - ci) / 2.0
    return (
        float(np.quantile(stats, lo)),
        float(np.quantile(stats, 1.0 - lo)),
    )
