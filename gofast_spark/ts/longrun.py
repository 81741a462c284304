"""Long-run series behavior: unit roots, AR(1) error correction, and
long memory — relational forms with exact-integer moments.

The reference reaches these through eager statsmodels wrappers
(``trend_analysis`` strategy='adf', gofast/utils/ts_utils.py:720 — see
ts/decompose.adf_test for the applyInPandas statsmodels form kept for
API parity; ``transform_stationarity`` differencing options
ts_utils.py:1870).  Here the Dickey-Fuller regression, the
Cochrane-Orcutt correction, and the rescaled-range slope are all
window + aggregate plans over the (days-sized) series frame whose
sufficient statistics are exact integers, so a SQL oracle can replay
every coefficient — the catalog's rollup-series contract (the raw
table is aggregated to one row per period before any of this runs;
at 100 TB that aggregation is the only big scan).

Determinism: series values are quantized to a fixed grid once, all
Gram moments are integer sums, and every derived coefficient is a
fixed-order Cramer expression over those integers (ml/regression
discipline).  Per-row residual products are re-quantized before
summing wherever a fitted coefficient enters a row expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofast_spark.ml.regression import _cramer_solve, _det3


def _q(x, unit: float):
    return F.floor(x * F.lit(unit) + F.lit(0.5)).cast("bigint")


def adf_relational(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    unit: int = 10_000,
) -> DataFrame:
    """Augmented Dickey-Fuller test with ONE augmentation lag
    (Dickey & Fuller, JASA 1979; Said & Dickey 1984 for the augmented
    form), constant included:

        dy_t = alpha + gamma * y_{t-1} + phi * dy_{t-1} + e_t

    H0: gamma = 0 (unit root).  Reports gamma, its t statistic, and
    the 5% decision against the constant-case asymptotic critical
    value -2.86 (Fuller 1976, Table 8.5.2).

    The series is quantized to ``1/unit`` once; the REGRESSOR LEVEL is
    centered on the integer floor-mean of the regression sample (a
    constant shift only moves the intercept, and keeps the level
    moments ~deviation-sized — no int64 overflow at any series
    scale); every Gram moment is then an exact integer and the
    3-unknown Cramer solve + t statistic are replayed expressions.
    gamma and t are scale-invariant, so the grid choice does not leak
    into the outputs.  Returns ONE row
    ``(n_obs, gamma, t_gamma, reject_5pct)``."""
    w = Window.orderBy(order_col)
    vu = _q(F.col(value_col).cast("double"), float(unit))
    base = df.select(
        F.col(order_col).alias("__o"), vu.alias("yu")
    ).select(
        "yu",
        F.lag("yu", 1).over(w.orderBy("__o")).alias("l1"),
        F.lag("yu", 2).over(w.orderBy("__o")).alias("l2"),
    ).where(F.col("l2").isNotNull())
    pre = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l1").alias("s")
    ).first()
    n = int(pre["n"])
    if n < 5:
        raise ValueError("adf_relational: need at least 5 usable rows")
    mbar = int(pre["s"]) // n  # floor-div: same integer on both engines
    x1 = F.col("l1") - F.lit(mbar)
    x2 = F.col("l1") - F.col("l2")
    y = F.col("yu") - F.col("l1")
    dec = "decimal(18,0)"
    row = base.agg(
        F.sum(x1.cast(dec)).alias("sx1"),
        F.sum(x2.cast(dec)).alias("sx2"),
        F.sum((x1 * x1).cast(dec)).alias("s11"),
        F.sum((x1 * x2).cast(dec)).alias("s12"),
        F.sum((x2 * x2).cast(dec)).alias("s22"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x1 * y).cast(dec)).alias("s1y"),
        F.sum((x2 * y).cast(dec)).alias("s2y"),
        F.sum((y * y).cast(dec)).alias("syy"),
    ).first()
    sx1, sx2 = float(row["sx1"]), float(row["sx2"])
    s11, s12, s22 = float(row["s11"]), float(row["s12"]), float(row["s22"])
    sy, s1y, s2y = float(row["sy"]), float(row["s1y"]), float(row["s2y"])
    syy = float(row["syy"])
    A = [
        [float(n), sx1, sx2],
        [sx1, s11, s12],
        [sx2, s12, s22],
    ]
    b = [sy, s1y, s2y]
    wts = _cramer_solve(A, b)
    gamma = wts[1]
    sse = (
        syy
        - 2.0 * sum(wi * bi for wi, bi in zip(wts, b))
        + sum(
            wts[i] * A[i][j] * wts[j]
            for i in range(3)
            for j in range(3)
        )
    )
    s2 = sse / (n - 3)
    det = _det3(A)
    # (A^-1)_{11} (gamma's position) = cofactor_11 / det
    c11 = float(n) * s22 - sx2 * sx2
    import math

    t_gamma = gamma / math.sqrt(s2 * c11 / det)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, round(gamma, 6), round(t_gamma, 4), bool(t_gamma < -2.86))],
        "n_obs bigint, gamma double, t_gamma double, reject_5pct boolean",
    )


def cochrane_orcutt(
    df: DataFrame,
    order_col: str,
    value_col: str,
    time_col: str,
    *,
    unit: int = 10_000,
    runit: int = 1_000_000,
) -> DataFrame:
    """Cochrane-Orcutt AR(1) error correction for the trend regression
    ``y_t = a + b t + u_t``, ``u_t = rho u_{t-1} + e_t`` (Cochrane &
    Orcutt, JASA 1949): fit OLS, estimate rho from lagged residuals,
    refit on the quasi-differenced data

        y_t - rho y_{t-1} = a(1 - rho) + b (t - rho (t-1)) + e_t .

    Moment discipline: the first fit's Gram moments are exact integers
    (y on the ``1/unit`` grid, t integral); the fitted (a, b) enter
    per-row residual expressions as exact double literals and every
    residual product is re-quantized to ``1/runit`` before the integer
    sums that give rho and the second fit — so both coefficient
    chains replay.  Returns ONE row
    ``(n, b_ols, rho, b_co)`` (slopes in original units per step)."""
    w = Window.orderBy(order_col)
    v = F.col(value_col).cast("double")
    t = F.col(time_col).cast("double")
    d = df.select(
        F.col(order_col).alias("__o"), v.alias("v"), t.alias("t")
    )
    m1 = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_q(F.col("t"), 1.0).cast("decimal(18,0)")).alias("st"),
        F.sum(
            (_q(F.col("t"), 1.0) * _q(F.col("t"), 1.0)).cast(
                "decimal(18,0)"
            )
        ).alias("stt"),
        F.sum(_q(F.col("v"), float(unit)).cast("decimal(18,0)")).alias(
            "sv"
        ),
        F.sum(
            (_q(F.col("t"), 1.0) * _q(F.col("v"), float(unit))).cast(
                "decimal(18,0)"
            )
        ).alias("stv"),
    ).first()
    n = int(m1["n"])
    st, stt = float(m1["st"]), float(m1["stt"])
    sv, stv = float(m1["sv"]), float(m1["stv"])
    u = float(unit)
    det = float(n) * stt - st * st
    b_u = (float(n) * stv - st * sv) / det  # slope on the 1/unit grid
    a_u = (sv * stt - st * stv) / det
    b_ols = b_u / u
    a_ols = a_u / u
    e = F.col("v") - (F.lit(a_ols) + F.lit(b_ols) * F.col("t"))
    lag_cols = d.select(
        "v", "t", e.alias("e"),
        F.lag(e).over(w.orderBy("__o")).alias("ep"),
        F.lag("v").over(w.orderBy("__o")).alias("vp"),
        F.lag("t").over(w.orderBy("__o")).alias("tp"),
    ).where(F.col("ep").isNotNull())
    ru = float(runit)
    m2 = lag_cols.agg(
        F.sum(_q(F.col("e") * F.col("ep"), ru)).alias("sep"),
        F.sum(_q(F.col("ep") * F.col("ep"), ru)).alias("spp"),
    ).first()
    rho = float(m2["sep"]) / float(m2["spp"])
    ys = F.col("v") - F.lit(rho) * F.col("vp")
    xs = F.col("t") - F.lit(rho) * F.col("tp")
    m3 = lag_cols.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(_q(xs, ru)).alias("sx"),
        F.sum(_q(xs * xs, ru)).alias("sxx"),
        F.sum(_q(ys, ru)).alias("sy"),
        F.sum(_q(xs * ys, ru)).alias("sxy"),
    ).first()
    m = float(m3["m"])
    sx, sxx = float(m3["sx"]), float(m3["sxx"])
    sy, sxy = float(m3["sy"]), float(m3["sxy"])
    # moments live on the 1/runit grid: slope needs one grid factor back
    b_co = (m * sxy / ru - sx / ru * (sy / ru)) / (
        m * sxx / ru - sx / ru * (sx / ru)
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, round(b_ols, 6), round(rho, 6), round(b_co, 6))],
        "n bigint, b_ols double, rho double, b_co double",
    )


def hurst_rs(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    block_sizes: "tuple[int, ...]" = (5, 10, 15),
    unit: int = 10_000,
    lunit: int = 1_000_000,
) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst 1951;
    Mandelbrot & Wallis 1969): for each block size m, split the series
    into complete blocks, compute each block's rescaled range

        R/S = (max_t S_t - min_t S_t) / sd_pop(block)

    with ``S_t`` the within-block cumulative deviations from the block
    mean, average ln(R/S) over blocks, and report the OLS slope of
    mean-ln(R/S) against ln(m) — the Hurst exponent H (0.5 = random
    walk increments, > 0.5 persistent).

    Integer discipline: values on the ``1/unit`` grid; within a block,
    ``m * S_t = m * cum_t - t * sum_block`` is an EXACT integer, so
    the range is exact; sd comes from integer moments; each block's
    ln(R/S) is quantized to ``1/lunit`` before the per-size integer
    mean and the final 2x2 slope over (ln m, mean) — one explode by
    block size, one grouped window pass, everything replayable.
    Degenerate blocks (zero variance) are excluded.  Returns one row
    per block size plus the slope carried on each row:
    ``(m, n_blocks, sum_ln_rs_u6, hurst)`` ordered by m."""
    import math

    w = Window.orderBy(order_col)
    vu = _q(F.col(value_col).cast("double"), float(unit))
    indexed = df.select(
        F.col(order_col).alias("__o"), vu.alias("yu")
    ).select(
        "yu", (F.row_number().over(w.orderBy("__o")) - 1).alias("t")
    )
    sizes = indexed.sparkSession.createDataFrame(
        [(int(m),) for m in block_sizes], "m int"
    )
    tagged = indexed.crossJoin(F.broadcast(sizes)).select(
        "m", "yu",
        F.floor(F.col("t") / F.col("m")).cast("bigint").alias("blk"),
        (F.col("t") % F.col("m")).alias("i"),
    )
    wb = Window.partitionBy("m", "blk")
    wcum = (
        Window.partitionBy("m", "blk")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = tagged.select(
        "m", "blk", "i", "yu",
        F.count(F.lit(1)).over(wb).alias("cnt"),
        F.sum("yu").over(wb).alias("sb"),
        # decimal(38,0): yu^2 approaches int64 range at 10x data scale
        # (yu is the 1e4-quantized value), so the int64 product/sum
        # overflows under ANSI while DuckDB's HUGEINT does not — widen
        # to match.  Caught by the r14 sf0.1 differential sweep.
        F.sum(F.col("yu").cast("decimal(19,0)") * F.col("yu"))
        .over(wb)
        .alias("qb"),
        F.sum("yu").over(wcum).alias("cum"),
    ).where(F.col("cnt") == F.col("m"))
    # m * S_t = m * cum - (i + 1) * sum_block : exact integers
    ms = F.col("m").cast("bigint") * F.col("cum") - (
        F.col("i") + F.lit(1)
    ) * F.col("sb")
    per_blk = scored.groupBy("m", "blk").agg(
        F.max(ms).alias("mx"),
        F.min(ms).alias("mn"),
        F.max("sb").alias("sb"),
        F.max("qb").alias("qb"),
    )
    md = F.col("m").cast("double")
    mean = F.col("sb").cast("double") / md
    var = F.col("qb").cast("double") / md - mean * mean
    r = (F.col("mx") - F.col("mn")).cast("double") / md
    ln_rs = F.log(r / F.sqrt(var))
    per_size = (
        per_blk.where(
            (F.col("qb") * F.col("m")
             - F.col("sb").cast("decimal(19,0)") * F.col("sb")) > 0
        )
        .select(
            "m", _q(ln_rs, float(lunit)).alias("lq")
        )
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("lq").alias("slq"),
        )
    )
    pts = [
        (int(r_["m"]), int(r_["n_blocks"]), int(r_["slq"]))
        for r_ in per_size.collect()
    ]
    if len(pts) < 2:
        raise ValueError("hurst_rs: need >= 2 block sizes with blocks")
    pts.sort()
    lu = float(lunit)
    xs = [math.log(float(m)) for m, _, _ in pts]
    ys = [slq / lu / nb for _, nb, slq in pts]
    k = float(len(pts))
    sx = sum(xs)
    sy = sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    hurst = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(m, nb, slq, round(hurst, 6)) for m, nb, slq in pts],
        "m int, n_blocks bigint, sum_ln_rs_u6 bigint, hurst double",
    ).orderBy("m")


def theil_sen(
    df: DataFrame,
    order_col: str,
    value_col: str,
    time_col: str,
    *,
    unit: int = 10_000,
) -> DataFrame:
    """Theil-Sen robust trend estimate (Theil 1950; Sen, JASA 1968 —
    the slope companion of the Mann-Kendall test already in the
    catalog): the LOWER median of all pairwise slopes
    ``(y_j - y_i) / (t_j - t_i)``, and the lower-median intercept of
    ``y_i - slope * t_i``.

    Values are quantized to ``1/unit`` so every pairwise slope is one
    division of exact integers; both medians are order statistics
    selected by integer rank with (slope, i, j) tie-breaks — no
    interpolation, fully engine-deterministic.  O(m^2) pairs on the
    days-sized rollup frame (the rollup-series contract; the raw-table
    aggregation upstream is the only big scan).  Returns ONE row
    ``(n, n_pairs, slope, intercept)``."""
    v = F.col(value_col).cast("double")
    t = F.col(time_col).cast("bigint")
    d = df.select(
        F.col(order_col).alias("__o"),
        _q(v, float(unit)).alias("vu"),
        t.alias("t"),
    )
    a = d.select(
        F.col("t").alias("at"), F.col("vu").alias("av")
    )
    b = d.select(
        F.col("t").alias("bt"), F.col("vu").alias("bv")
    )
    u = float(unit)
    pairs = a.join(b, F.col("at") < F.col("bt"))
    slope = (
        (F.col("bv") - F.col("av")).cast("double")
        / F.lit(u)
        / (F.col("bt") - F.col("at")).cast("double")
    )
    wr = Window.orderBy(slope, F.col("at"), F.col("bt"))
    tot = Window.partitionBy()
    ranked = pairs.select(
        slope.alias("s"),
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(tot).alias("np"),
    )
    med = ranked.where(
        F.col("i")
        == F.floor(
            (F.col("np").cast("double") + F.lit(1.0)) / F.lit(2.0)
        ).cast("bigint")
    ).first()
    sen, n_pairs = float(med["s"]), int(med["np"])
    resid = F.col("vu").cast("double") / F.lit(u) - F.lit(sen) * F.col(
        "t"
    ).cast("double")
    wi = Window.orderBy(resid, F.col("t"))
    toti = Window.partitionBy()
    ranked_i = d.select(
        resid.alias("b0"),
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(toti).alias("n"),
    )
    mi = ranked_i.where(
        F.col("i")
        == F.floor(
            (F.col("n").cast("double") + F.lit(1.0)) / F.lit(2.0)
        ).cast("bigint")
    ).first()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(mi["n"]), n_pairs, sen, float(mi["b0"]))],
        "n bigint, n_pairs bigint, slope double, intercept double",
    )
