"""Distribution-drift monitoring: PSI and smoothed KL over fixed bins.

The production-ML monitoring staple (the reference keeps drift checks
in its mlops layer, gofast/mlops/ — out of engine scope there, an
aggregation here): compare a feature's distribution between a
reference sample and a current sample over a DECLARED equi-width grid
and report the Population Stability Index

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

(the symmetrized KL between the binned distributions; credit-risk
folklore thresholds: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted)
plus each side's bin shares.  Laplace smoothing keeps empty bins
finite.

Scale shape: one projection + one bins-sized groupBy per side (map
-side combined), a 1-row broadcast of the totals, and the PSI is one
aggregate of the bins frame.  The declared [lo, hi) grid (the
``value_histogram`` convention) makes results deterministic and the
two sides directly comparable — no data-dependent quantile cuts to
drift on their own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(col: Column, lo: float, width: float, bins: int) -> Column:
    return F.least(
        F.greatest(
            F.floor((col - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(bins - 1),
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """One row: ``(psi, n_ref, n_cur)`` for ``col`` between the two
    frames over the declared grid; out-of-range values clamp to the
    edge bins (they still count — a mass shift past the grid edge is
    drift, not data to ignore)."""
    if bins < 2 or not hi > lo:
        raise ValueError("need bins >= 2 and hi > lo")
    width = (hi - lo) / bins
    s = float(smooth)

    def side(df: DataFrame, name: str) -> DataFrame:
        x = F.col(col).cast("double")
        return (
            df.where(x.isNotNull())
            .groupBy(_bin(x, lo, width, bins).alias("bin"))
            .agg(F.count(F.lit(1)).alias(f"n_{name}"))
        )
    a = side(ref, "ref")
    b = side(cur, "cur")
    grid = ref.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        grid.join(a, "bin", "left")
        .join(b, "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_ref") + F.lit(s)) / (F.col("__tr") + F.lit(s) * bins)
    q = (F.col("n_cur") + F.lit(s)) / (F.col("__tc") + F.lit(s) * bins)
    return (
        joined.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((p - q) * F.log(p / q)).alias("psi"),
            F.max("__tr").alias("n_ref"),
            F.max("__tc").alias("n_cur"),
        )
    )


def psi_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    smooth: float = 0.5,
    unit: int = 1_000_000,
) -> DataFrame:
    """Per-group drift report from ONE scan: for every ``group_col``
    value, the PSI of ``col``'s binned distribution against the REST
    of the corpus (leave-one-group-out) — the per-source monitoring
    readout a training-data pipeline runs over its ingest sources
    ("which source shifted?"), generalizing :func:`psi_report`'s
    two-frame form.

    Shape: one groupBy((group, bin)) count, a dense groups x bins grid
    (distinct groups joined to a broadcast bin spine so empty bins
    still contribute their smoothing term), and window sums for the
    group/bin/grand margins — no second pass, no per-group scans.  The
    summands are quantized to ``1/unit`` before the final integer sum
    (the repo's transcendental-sum discipline), so the report is
    engine-exact.  Returns ``(group, n_group, n_rest, psi_u6)``
    ordered by group."""
    if bins < 2 or not hi > lo:
        raise ValueError("need bins >= 2 and hi > lo")
    width = (hi - lo) / bins
    s = float(smooth)
    x = F.col(col).cast("double")
    counts = (
        df.where(x.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bin(x, lo, width, bins).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    grid = (
        counts.select("grp").distinct()
        .crossJoin(F.broadcast(spine))
        .join(counts, ["grp", "bin"], "left")
        .select(
            "grp", "bin", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    from pyspark.sql import Window

    w_grp = Window.partitionBy("grp")
    w_bin = Window.partitionBy("bin")
    w_all = Window.partitionBy()
    m = grid.select(
        "grp",
        "bin",
        "n",
        F.sum("n").over(w_grp).alias("n_g"),
        (F.sum("n").over(w_bin) - F.col("n")).alias("rest_b"),
        (F.sum("n").over(w_all) - F.sum("n").over(w_grp)).alias("rest_t"),
    )
    p = (F.col("n") + F.lit(s)) / (F.col("n_g") + F.lit(s * bins))
    q = (F.col("rest_b") + F.lit(s)) / (F.col("rest_t") + F.lit(s * bins))
    term_u = F.floor((p - q) * F.log(p / q) * unit + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        m.groupBy(F.col("grp").alias("group"))
        .agg(
            F.max("n_g").cast("bigint").alias("n_group"),
            F.max("rest_t").cast("bigint").alias("n_rest"),
            F.sum(term_u).alias("psi_u6"),
        )
        .orderBy("group")
    )


def ks_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 100,
    unit: int = 1_000_000,
) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov drift statistic from
    ONE scan: for every group, ``D = max_b |F_group(b) - F_rest(b)|``
    over a declared ``bins``-point grid (group vs rest-of-corpus ECDFs
    evaluated on the binned support — the scale-safe KS: exact in the
    grid resolution, no per-group sort of raw values).

    Shape mirrors :func:`psi_by_group`: one groupBy((group, bin)), a
    dense grid, cumulative windows per group for both ECDFs (the rest
    ECDF from the grand cumulative minus the group's own).  All
    arithmetic is integer counts and single divisions — no
    transcendentals — quantized to ``1/unit``.  Returns ``(group,
    n_group, n_rest, ks_u6)`` ordered by group."""
    if bins < 2 or not hi > lo:
        raise ValueError("need bins >= 2 and hi > lo")
    width = (hi - lo) / bins
    x = F.col(col).cast("double")
    counts = (
        df.where(x.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bin(x, lo, width, bins).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    grid = (
        counts.select("grp").distinct()
        .crossJoin(F.broadcast(spine))
        .join(counts, ["grp", "bin"], "left")
        .select(
            "grp", "bin", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    from pyspark.sql import Window

    w_grp = Window.partitionBy("grp")
    w_bin = Window.partitionBy("bin")
    w_all = Window.partitionBy()
    w_cum = Window.partitionBy("grp").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    margins = grid.select(
        "grp",
        "bin",
        "n",
        F.sum("n").over(w_bin).alias("tot_b"),
        F.sum("n").over(w_grp).alias("n_g"),
        F.sum("n").over(w_all).alias("n_all"),
    )
    m = margins.select(
        "grp",
        "bin",
        "n_g",
        "n_all",
        F.sum("n").over(w_cum).alias("cum_g"),
        F.sum("tot_b").over(w_cum).alias("cum_all"),
    )
    f_g = F.col("cum_g").cast("double") / F.col("n_g").cast("double")
    # single-group corpus: the rest ECDF is undefined (0/0 would
    # NaN-poison the bigint cast under ANSI) — define D = 0, there is
    # nothing to drift against
    f_r = F.when(
        F.col("n_all") > F.col("n_g"),
        (F.col("cum_all") - F.col("cum_g")).cast("double")
        / (F.col("n_all") - F.col("n_g")).cast("double"),
    ).otherwise(f_g)
    d_u = F.floor(F.abs(f_g - f_r) * unit + F.lit(0.5)).cast("bigint")
    return (
        m.groupBy(F.col("grp").alias("group"))
        .agg(
            F.max("n_g").cast("bigint").alias("n_group"),
            (F.max("n_all") - F.max("n_g")).cast("bigint").alias("n_rest"),
            F.max(d_u).alias("ks_u6"),
        )
        .orderBy("group")
    )


def psi_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    *,
    bins: int,
    smooth: float = 0.5,
) -> DataFrame:
    """PSI from two pre-aggregated ``(bin, n)`` frames (e.g. a drained
    streaming histogram state vs a stored reference histogram) — the
    monitoring fast path: no raw rows touched, input is 2 x ``bins``
    counters.  Missing bins count as 0; same smoothing/grid contract
    as :func:`psi_report`."""
    s = float(smooth)
    spark = ref_counts.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        grid.join(
            ref_counts.select("bin", F.col("n").alias("n_ref")), "bin",
            "left",
        )
        .join(
            cur_counts.select("bin", F.col("n").alias("n_cur")), "bin",
            "left",
        )
        .select(
            "bin",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    p = (F.col("n_ref") + F.lit(s)) / (F.col("__tr") + F.lit(s) * bins)
    q = (F.col("n_cur") + F.lit(s)) / (F.col("__tc") + F.lit(s) * bins)
    return (
        joined.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((p - q) * F.log(p / q)).alias("psi"),
            F.max("__tr").alias("n_ref"),
            F.max("__tc").alias("n_cur"),
        )
    )
