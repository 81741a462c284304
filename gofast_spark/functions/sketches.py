"""Mergeable sketches: distinct counts (Apache DataSketches HLL via the
built-in ``hll_sketch_agg`` family) and fixed-grid value histograms for
re-aggregatable quantile estimation.

The 100-TB story: exact ``count(distinct x)`` / exact percentiles
re-shuffle raw values for every grouping you ever want; a sketch is a
few KB per group, partial-aggregatable (map-side combine), and
REAGGREGATABLE — daily sketches union into weekly/monthly estimates
without touching raw data again.  That second property is what
``approx_count_distinct`` / ``percentile_approx`` alone do not give
you: they return a number, not a mergeable state.

HLL functions stay JVM-side (Tungsten DataSketches implementation);
accuracy is the standard HLL bound (~1.6% rsd at the default
lgConfigK=12).  The histogram sketch is a (group, bin, cnt) frame over
a fixed equi-width grid — unlike the KLL/t-digest family its merge is
a plain integer re-sum (deterministic, oracle-checkable bit-for-bit)
and its quantile error is bounded by one bin width of the declared
[lo, hi) range.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    sketch_col: str = "sketch",
    lg_config_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group —
    the persistable/mergeable aggregation state."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_config_k)).alias(sketch_col)
    )


def sketch_rollup_estimate(
    sketches: DataFrame,
    rollup_cols: Sequence[str],
    *,
    sketch_col: str = "sketch",
    out_col: str = "distinct_est",
) -> DataFrame:
    """Union pre-built sketches up to a coarser grouping and estimate
    the distinct count — no raw data access, cost proportional to the
    number of sketches, not rows."""
    return sketches.groupBy(*rollup_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    )


def distinct_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    *,
    out_col: str = "distinct_est",
    lg_config_k: int = 12,
) -> DataFrame:
    """Convenience: sketch at the fine grain, roll up to the coarse
    grain in one plan (the daily->weekly distinct-users pattern).
    The sketch grain is the UNION of coarse and fine columns, so the
    coarse keys survive the fine aggregation for the rollup."""
    grain = list(dict.fromkeys([*coarse_cols, *fine_cols]))
    sk = distinct_sketch(df, grain, value_col, lg_config_k=lg_config_k)
    return sketch_rollup_estimate(sk, coarse_cols, out_col=out_col)


# ---------------------------------------------------------------------------
# Fixed-grid histogram sketches: mergeable quantiles
# ---------------------------------------------------------------------------


def value_histogram(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """(group..., bin, cnt): equi-width histogram of ``value_col`` over
    the declared ``[lo, hi)`` range — the persistable, mergeable
    aggregation state for quantile estimation.  Values outside the
    range clamp into the edge bins (estimates there degrade to the
    range edge — declare a range that covers the data).  NULLs drop.
    One groupBy; bin assignment is pure codegen arithmetic."""
    width = (hi - lo) / bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b)).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_rollup(
    hist: DataFrame, rollup_cols: Sequence[str]
) -> DataFrame:
    """Merge pre-built histogram sketches up to a coarser grouping —
    a plain integer re-sum per (rollup, bin): cost proportional to the
    number of sketch rows, not raw rows, and exactly equal to the
    histogram built from raw data directly."""
    return hist.groupBy(*rollup_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantile(
    hist: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    *,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """(group..., q, est): per-group quantile estimates from a
    histogram sketch — the upper edge of the first bin whose cumulative
    count reaches ``q * total``, so ``est`` over-estimates the true
    quantile by at most one bin width (exact statement: the true
    quantile lies in ``(est - width, est]`` whenever the data fits
    [lo, hi)).

    The cumulative pass is a window ordered by bin WITHIN each group —
    at most ``bins`` rows per group, so no single-reducer sort ever
    appears regardless of data volume."""
    width = (hi - lo) / bins
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("total"),
    )
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        cum.select(*group_cols, "bin", "cum", "total",
                   F.explode(q_arr).alias("q"))
        .where(F.col("cum") >= F.col("q") * F.col("total"))
        .groupBy(*group_cols, "q")
        .agg(F.min("bin").alias("__b"))
        .select(
            *group_cols,
            "q",
            (F.lit(lo) + (F.col("__b") + 1) * F.lit(width)).alias("est"),
        )
    )


def distinct_intersection_estimate(
    df,
    key_col: str,
    cond_a,
    cond_b,
    *,
    lgk: int = 12,
):
    """Estimate |A ∩ B| for two cohorts of one key WITHOUT shuffling the
    raw keys twice: HLL sketch-algebra inclusion-exclusion,
    ``|A∩B| ≈ est(A) + est(B) - est(A ∪ B)``, where the union estimate
    comes from merging the two sketches (``hll_union_agg``) — the set
    operation HLL supports natively.  One pass builds both cohort
    sketches and their union; error compounds to a few percent of the
    LARGER cohort (the standard caveat: inclusion-exclusion degrades
    for small intersections of large sets).

    Returns 1 row: ``(est_a, est_b, est_union, est_intersection)``.
    The audience-overlap question (viewed AND purchased; saw campaign
    AND converted) answered from kilobyte sketches."""
    key = F.col(key_col)
    sk_a = F.hll_sketch_agg(F.when(cond_a, key), F.lit(lgk))
    sk_b = F.hll_sketch_agg(F.when(cond_b, key), F.lit(lgk))
    one = df.agg(sk_a.alias("ska"), sk_b.alias("skb"))
    return one.select(
        F.hll_sketch_estimate("ska").alias("est_a"),
        F.hll_sketch_estimate("skb").alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_union("ska", "skb")
        ).alias("est_union"),
        (
            F.hll_sketch_estimate("ska")
            + F.hll_sketch_estimate("skb")
            - F.hll_sketch_estimate(F.hll_union("ska", "skb"))
        ).alias("est_intersection"),
    )


def kmv_estimate(
    df: DataFrame,
    key_col: str,
    group_col: str | None = None,
    *,
    k: int = 32,
) -> DataFrame:
    """K-minimum-values distinct-count estimate (Bar-Yossef et al.,
    RANDOM 2002; the theta-sketch family's base estimator): hash keys
    to uniform integers, keep the ``k`` smallest DISTINCT hashes per
    group, and estimate

        D ~ (k - 1) / U_(k),   U_(k) = kth smallest hash / 2^60

    (unbiased for the uniform kth order statistic).  Groups holding
    fewer than ``k`` distinct keys report their EXACT count (the
    sketch IS the value set there — the standard KMV small-set rule).
    Engine-exact by construction: the md5 hash and the kth minimum are
    deterministic, so unlike HLL this sketch is bit-replayable in the
    SQL oracle.  Shapes: one distinct aggregate, one per-group top-k
    window over the DISTINCT-hash frame (vocab-sized, never raw rows).
    """
    from pyspark.sql import Window

    from gofast_spark.text.hashing import md5_hash64

    if k < 2:
        raise ValueError("k must be >= 2")
    g = [group_col] if group_col else []
    hashes = (
        df.where(F.col(key_col).isNotNull())
        .select(*g, md5_hash64(F.col(key_col).cast("string")).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*g).orderBy("__h")
    topk = hashes.select(
        *g, "__h", F.row_number().over(w).alias("__rn")
    ).where(F.col("__rn") <= k)
    per = topk.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__kth"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.col("__kth").cast("double") / F.lit(float(2**60)))
    )
    cols = g + [
        F.col("n_kept").cast("bigint").alias("n_kept"),
        est.alias("estimate"),
    ]
    return per.select(*cols)
