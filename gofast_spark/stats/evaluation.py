"""Model-evaluation statistics: normality, goodness-of-fit, information
criteria, residual diagnostics.

Reference: the evaluation classes (gofast/stats/evaluation.py:339
``GoodnessOfFit``, :904 ``NormalityTests``, :1028 ``InformationCriteria``,
:1318 ``ResidualAnalysis``) wrap scipy on in-memory arrays.  The reference
tests Shapiro-Wilk / Anderson-Darling; both need full order statistics,
which don't reduce.  The distributed re-expressions here are the
moment-based equivalents every large-scale system uses:

- ``jarque_bera``: skewness/kurtosis normality test — ONE aggregate pass
  (n, mean and central moments 2-4 via raw-moment identities).
- ``chi2_gof``: categorical goodness-of-fit against expected shares —
  one groupBy.
- ``aic_bic``: Gaussian-likelihood information criteria from the residual
  sum of squares — one aggregate.
- ``durbin_watson``: lag-1 residual autocorrelation statistic — a lag
  window over the ordered residuals (partition by series for many
  series; the reduced-series contract otherwise).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jarque_bera(df: DataFrame, value_col: str) -> DataFrame:
    """Jarque-Bera normality statistic: JB = n/6 * (S^2 + (K-3)^2/4),
    skewness S and kurtosis K from raw moments in a single aggregate.
    Output: (jb_stat, skewness, kurtosis, n)."""
    x = F.col(value_col).cast("double")
    agg = df.agg(
        F.count(x).alias("n"),
        F.avg(x).alias("m1"),
        F.avg(x * x).alias("m2"),
        F.avg(x * x * x).alias("m3"),
        F.avg(x * x * x * x).alias("m4"),
    )
    mu = F.col("m1")
    c2 = F.col("m2") - mu * mu
    c3 = F.col("m3") - 3 * mu * F.col("m2") + 2 * mu * mu * mu
    c4 = (
        F.col("m4")
        - 4 * mu * F.col("m3")
        + 6 * mu * mu * F.col("m2")
        - 3 * mu * mu * mu * mu
    )
    skew = c3 / F.pow(c2, 1.5)
    kurt = c4 / (c2 * c2)
    jb = F.col("n") / 6.0 * (skew * skew + F.pow(kurt - 3.0, 2) / 4.0)
    return agg.select(
        jb.alias("jb_stat"),
        skew.alias("skewness"),
        kurt.alias("kurtosis"),
        F.col("n").cast("bigint").alias("n"),
    )


def chi2_gof(
    df: DataFrame,
    cat_col: str,
    expected_shares: dict | None = None,
) -> DataFrame:
    """Chi-square goodness-of-fit of a categorical column against expected
    shares (GoodnessOfFit, gofast/stats/evaluation.py:339).  ``None``
    tests uniformity.  Output: (chi2_stat, dof, n).

    Single pass: the one groupBy reduces the input to <= |categories|
    rows, and the total / category count come from a global window over
    that tiny frame (bounded by category cardinality, so the single
    partition is fine) — no extra count/collect actions rescanning the
    input.  With ``expected_shares`` the join is FULL outer: expected
    categories that never occur contribute their (0 - exp)^2/exp term
    (scipy.chisquare semantics), and an observed category absent from
    ``expected_shares`` raises instead of silently renormalizing."""
    counts = df.groupBy(F.col(cat_col).alias("__c")).agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    )
    w = Window.partitionBy(F.lit(1))
    if expected_shares is not None:
        spark = df.sparkSession
        exp = spark.createDataFrame(
            [(k, float(v)) for k, v in expected_shares.items()],
            ["__c", "share"],
        )
        counts = counts.join(F.broadcast(exp), on="__c", how="full_outer").select(
            "__c",
            F.coalesce(F.col("obs"), F.lit(0.0)).alias("obs"),
            F.when(
                F.col("share").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "chi2_gof: observed category missing from "
                            "expected_shares: "
                        ),
                        F.col("__c").cast("string"),
                    )
                ),
            )
            .otherwise(F.col("share"))
            .alias("share"),
        )
        counts = counts.withColumn(
            "exp", F.col("share") * F.sum("obs").over(w)
        )
    else:
        counts = counts.withColumn(
            "exp", F.sum("obs").over(w) / F.count(F.lit(1)).over(w)
        )
    out = counts.agg(
        F.sum(F.pow(F.col("obs") - F.col("exp"), 2) / F.col("exp")).alias(
            "chi2_stat"
        ),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
        F.sum("obs").cast("bigint").alias("n"),
    )
    return out


def aic_bic(
    df: DataFrame, y_col: str, yhat_col: str, *, n_params: int
) -> DataFrame:
    """Gaussian AIC/BIC from the residual sum of squares
    (InformationCriteria, gofast/stats/evaluation.py:1028):
    AIC = n ln(RSS/n) + 2k, BIC = n ln(RSS/n) + k ln(n)."""
    r = F.col(y_col).cast("double") - F.col(yhat_col).cast("double")
    agg = df.agg(
        F.sum(r * r).alias("rss"), F.count(F.lit(1)).cast("double").alias("n")
    )
    ll_core = F.col("n") * F.log(F.col("rss") / F.col("n"))
    return agg.select(
        (ll_core + 2.0 * n_params).alias("aic"),
        (ll_core + n_params * F.log(F.col("n"))).alias("bic"),
        F.col("rss").alias("rss"),
        F.col("n").cast("bigint").alias("n"),
    )


def durbin_watson(
    df: DataFrame,
    resid_col: str,
    order_col: str,
    *,
    partition_by: str | None = None,
) -> DataFrame:
    """Durbin-Watson lag-1 autocorrelation statistic over ordered
    residuals (ResidualAnalysis, gofast/stats/evaluation.py:1318):
    DW = sum((e_t - e_{t-1})^2) / sum(e_t^2).  Partition by series for
    many independent series; unpartitioned use is the reduced-series
    contract (the input is an already-aggregated series, not raw rows)."""
    e = F.col(resid_col).cast("double")
    w = (
        Window.partitionBy(partition_by).orderBy(order_col)
        if partition_by
        else Window.orderBy(order_col)
    )
    lagged = df.select(
        *( [F.col(partition_by)] if partition_by else [] ),
        e.alias("__e"),
        F.lag(e).over(w).alias("__ep"),
    )
    keys = [partition_by] if partition_by else []
    agg = lagged.groupBy(*keys).agg(
        F.sum(F.pow(F.col("__e") - F.col("__ep"), 2)).alias("num"),
        F.sum(F.col("__e") * F.col("__e")).alias("den"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return agg.select(
        *keys, (F.col("num") / F.col("den")).alias("dw_stat"), "n"
    )


def residual_analysis(
    df: DataFrame, y_col: str, yhat_col: str, order_col: str
) -> DataFrame:
    """Residual diagnostic bundle: mean/sd, Jarque-Bera, Durbin-Watson —
    the ResidualAnalysis composite as three reductions."""
    r = (F.col(y_col).cast("double") - F.col(yhat_col).cast("double")).alias(
        "__r"
    )
    base = df.select(r, F.col(order_col).alias("__o"))
    mom = base.agg(
        F.avg("__r").alias("resid_mean"),
        F.stddev_samp("__r").alias("resid_sd"),
    )
    jb = jarque_bera(base, "__r").select("jb_stat", "skewness", "kurtosis")
    dw = durbin_watson(base, "__r", "__o").select("dw_stat", "n")
    return mom.crossJoin(jb).crossJoin(dw)


def hosmer_lemeshow(
    df: DataFrame,
    p_col: str,
    y_col: str,
    *,
    n_bins: int = 10,
    unit: int = 1_000_000,
) -> DataFrame:
    """Hosmer-Lemeshow calibration test for a fitted binary classifier
    (Hosmer & Lemeshow 1980; reference: gofast/stats/evaluation.py:379
    ``GoodnessOfFit.hosmer_lemeshow_test``), in the FIXED-CUTPOINT
    form: rows are grouped into ``n_bins`` equal-width probability
    bins (not sample deciles — rank-based deciles are not stable
    across engines when two predictions differ by one ulp, while a
    fixed 1/n_bins grid moves a row only if its probability sits at a
    bin edge), and

        chi2 = sum_g (O_g - E_g)^2 / E_g + (O'_g - E'_g)^2 / E'_g

    over the event/non-event cells.  Predicted probabilities are
    u6-quantized BEFORE binning and summing, so O/E are exact integers
    and every per-bin contribution is quantized before the final
    integer sum — deterministic end-to-end.  Bins whose expected count
    is zero on either side are excluded (dof = used_bins - 2, the HL
    convention).  Returns ONE row ``(n, bins_used, chi2_u6, dof)``."""
    p = F.col(p_col).cast("double")
    y = F.col(y_col).cast("double")
    u = float(unit)
    d = df.where(p.isNotNull() & y.isNotNull()).select(
        F.floor(p * F.lit(u) + F.lit(0.5)).cast("bigint").alias("pu"),
        y.cast("bigint").alias("y"),
    )
    width = unit // n_bins
    binned = d.select(
        F.least(
            F.floor(F.col("pu") / F.lit(width)).cast("int"),
            F.lit(n_bins - 1),
        ).alias("bin"),
        "pu",
        "y",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("y").alias("o1"),
        F.sum("pu").alias("e1u"),
    )
    ng = F.col("n_g").cast("double")
    e1 = F.col("e1u").cast("double") / F.lit(u)
    diff = F.col("o1").cast("double") - e1
    contrib = diff * diff / e1 + diff * diff / (ng - e1)
    used = per.where(
        (F.col("e1u") > 0)
        & (F.col("n_g") * F.lit(unit) - F.col("e1u") > 0)
    )
    agg = used.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("bins_used"),
        F.sum(
            F.floor(contrib * F.lit(u) + F.lit(0.5)).cast("bigint")
        ).alias("chi2_u6"),
    )
    return agg.select(
        "n",
        "bins_used",
        "chi2_u6",
        (F.col("bins_used") - 2).cast("bigint").alias("dof"),
    )


def spiegelhalter_z(
    df: DataFrame,
    p_col: str,
    y_col: str,
    *,
    unit: int = 1_000_000_000,
) -> DataFrame:
    """Spiegelhalter's Z calibration test (Spiegelhalter, Statistics
    in Medicine 1986) — the unbinned companion of
    :func:`hosmer_lemeshow`: under perfect calibration

        Z = sum (y_i - p_i)(1 - 2 p_i)
            / sqrt( sum (1 - 2 p_i)^2 p_i (1 - p_i) )

    is asymptotically standard normal.  Each numerator and
    denominator summand is quantized to ``1/unit`` before the integer
    sums, so Z is one replayed expression.  Returns ONE row
    ``(n, num_u9, den_u9, z)``."""
    p = F.col(p_col).cast("double")
    y = F.col(y_col).cast("double")
    d = df.where(p.isNotNull() & y.isNotNull()).select(
        p.alias("p"), y.alias("y")
    )
    u = float(unit)
    num = (F.col("y") - F.col("p")) * (
        F.lit(1.0) - F.lit(2.0) * F.col("p")
    )
    den = (
        (F.lit(1.0) - F.lit(2.0) * F.col("p"))
        * (F.lit(1.0) - F.lit(2.0) * F.col("p"))
        * F.col("p")
        * (F.lit(1.0) - F.col("p"))
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(num * F.lit(u) + F.lit(0.5)).cast("bigint")
        ).alias("nu"),
        F.sum(
            F.floor(den * F.lit(u) + F.lit(0.5)).cast("bigint")
        ).alias("de"),
    )
    z = F.col("nu").cast("double") / F.lit(u) / F.sqrt(
        F.col("de").cast("double") / F.lit(u)
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("nu").alias("num_u9"),
        F.col("de").alias("den_u9"),
        z.alias("z"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    outcome: Column,
    *,
    bins: int = 10,
    quantize: int = 100,
) -> DataFrame:
    """Cumulative gain / lift table over descending score bins — the
    targeting-model readout beside the calibration curve and ROC AUC
    (the reference's evaluation family, gofast/stats/evaluation.py):
    bin the score, walk bins from best to worst, and report what
    fraction of all positives each cumulative cut captures (gain) and
    the capture rate relative to random targeting (lift).

    Bins are FIXED-WIDTH over the observed [min, max] score span —
    the Hosmer-Lemeshow lesson: rank deciles are not ulp-stable
    across engines, while integer fixed-width binning

        bin = floor((x - mn) * bins / (mx - mn + 1))

    over quantized scores is exact arithmetic both sides.  One
    aggregate for the span (broadcast spine), one groupBy over bins,
    one cumulative window over the bins-sized frame.  Gain and lift
    are integer ratios: lift = cum_pos * n / (cum_n * total_pos)."""
    x = F.floor(
        F.col(score_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    y = outcome.cast("int")
    base = df.where(F.col(score_col).isNotNull() & y.isNotNull()).select(
        x.alias("__x"), y.alias("__y")
    )
    span = base.agg(
        F.min("__x").alias("__mn"), F.max("__x").alias("__mx")
    )
    b = F.floor(
        (F.col("__x") - F.col("__mn"))
        * F.lit(bins)
        / (F.col("__mx") - F.col("__mn") + 1)
    ).cast("int")
    binned = base.crossJoin(F.broadcast(span)).select(
        b.alias("bin"), "__y"
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("n_pos"),
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    cum = per.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n_pos").over(w).alias("cum_pos"),
        F.sum("n").over(tot).alias("__tn"),
        F.sum("n_pos").over(tot).alias("__tp"),
    )
    gain = F.col("cum_pos").cast("double") / F.col("__tp").cast("double")
    lift = (
        F.col("cum_pos").cast("decimal(19,0)") * F.col("__tn")
    ).cast("double") / (
        F.col("cum_n").cast("decimal(19,0)") * F.col("__tp")
    ).cast("double")
    return cum.select(
        "bin",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        F.col("cum_pos").cast("bigint").alias("cum_pos"),
        gain.alias("gain"),
        lift.alias("lift"),
    )


def qq_normal_points(
    df: DataFrame,
    value_col: str,
    *,
    deciles: int = 10,
    quantize: int = 100,
) -> DataFrame:
    """Normal Q-Q report at interior deciles: the empirical quantile
    (lower order statistic by integer rank, ceil(i*n/k)) against the
    fitted-normal quantile mu + sigma * Phi^{-1}(i/k) — the tabular
    companion of the KS/CvM/AD normality battery (the reference's
    NormalityTests family, gofast/stats/evaluation.py:904).

    Determinism and scale: values quantize to ``1/quantize`` units;
    the order statistic is selected on the distinct-value cumulative
    frame (min value whose cumulative count reaches the integer rank
    ceil(i*n/k) = (i*n + k - 1) DIV k — never a full-table sort);
    mu/sigma come from one integer-moment aggregate; Phi^{-1} is the
    shared Acklam polynomial.  Returns k-1 rows ``(p, q_emp, q_theo,
    diff)``."""
    from gofast_spark.stats.probs import normal_ppf

    x = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    base = df.where(F.col(value_col).isNotNull()).select(x.alias("__x"))
    mom = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__x").cast("decimal(19,0)")).alias("__s"),
        F.sum(F.col("__x").cast("decimal(19,0)") * F.col("__x")).alias(
            "__ss"
        ),
    )
    from gofast_spark.stats.descriptive import integer_rank_quantiles

    emp = integer_rank_quantiles(base, deciles).crossJoin(
        F.broadcast(mom.select("__s", "__ss"))
    )
    n = F.col("__n").cast("double")
    mu = F.col("__s").cast("double") / n / F.lit(float(quantize))
    var = (
        (
            F.col("__ss").cast("double")
            - F.col("__s").cast("double")
            * F.col("__s").cast("double")
            / n
        )
        / (n - 1.0)
        / F.lit(float(quantize) * float(quantize))
    )
    p = F.col("__i").cast("double") / F.lit(float(deciles))
    q_theo = mu + F.sqrt(var) * normal_ppf(p)
    q_emp = F.col("__q").cast("double") / F.lit(float(quantize))
    return emp.select(
        p.alias("p"),
        q_emp.alias("q_emp"),
        q_theo.alias("q_theo"),
        (q_emp - q_theo).alias("diff"),
    )


def lin_ccc(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    quantize: int = 100,
) -> DataFrame:
    """Lin's concordance correlation coefficient (Lin, Biometrics
    1989): agreement between two measurements of the same quantity —
    Pearson r penalized by location and scale shift, the
    reproducibility score of a reconciliation/method-comparison
    check:

        CCC = 2 s_xy / (s_x^2 + s_y^2 + (xbar - ybar)^2)
            = 2 (n Sxy - Sx Sy)
              / ((n Sxx - Sx^2) + (n Syy - Sy^2) + (Sx - Sy)^2)

    — the second form is PURE INTEGER over quantized moments (the
    n^2 factors cancel), so one aggregate and one double division.
    Returns one row ``(ccc, r_pearson, n)``."""
    qa = F.floor(
        F.col(col_a).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    qb = F.floor(
        F.col(col_b).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    base = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(qa.alias("__a"), qb.alias("__b"))

    def d(c):
        return F.col(c).cast("decimal(19,0)")

    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("__a")).alias("sa"),
        F.sum(d("__b")).alias("sb"),
        F.sum(d("__a") * F.col("__a")).alias("saa"),
        F.sum(d("__b") * F.col("__b")).alias("sbb"),
        F.sum(d("__a") * F.col("__b")).alias("sab"),
    )
    n = F.col("n").cast("decimal(38,0)")
    cov = n * F.col("sab") - F.col("sa") * F.col("sb")
    va = n * F.col("saa") - F.col("sa") * F.col("sa")
    vb = n * F.col("sbb") - F.col("sb") * F.col("sb")
    shift = (F.col("sa") - F.col("sb")).cast("decimal(38,0)") * (
        F.col("sa") - F.col("sb")
    )
    ccc = (2.0 * cov.cast("double")) / (
        va.cast("double") + vb.cast("double") + shift.cast("double")
    )
    r = cov.cast("double") / F.sqrt(va.cast("double") * vb.cast("double"))
    return agg.select(
        ccc.alias("ccc"),
        r.alias("r_pearson"),
        F.col("n").cast("bigint").alias("n"),
    )


def bland_altman(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    quantize: int = 1_000_000,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Bland-Altman limits of agreement (Bland & Altman, Lancet
    1986): mean difference between two paired measurements and the
    interval mean +- z * sd(diff) expected to cover ~95% of
    differences — the bias/limits companion of :func:`lin_ccc`.

    Differences quantize to micro-units, so the moment sums are
    exact integers; mean, sd, and both limits are closed-form doubles
    over them.  ONE aggregate, no second pass.  Returns one row
    ``(n, mean_diff, sd_diff, loa_lo, loa_hi)``."""
    da = F.floor(
        F.col(col_a).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    db = F.floor(
        F.col(col_b).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    dd = (da - db).alias("__d")
    base = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(dd)
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__d").cast("decimal(19,0)")).alias("s"),
        F.sum(F.col("__d").cast("decimal(19,0)") * F.col("__d")).alias(
            "ss"
        ),
    )
    n = F.col("n").cast("double")
    q = F.lit(float(quantize))
    mean = F.col("s").cast("double") / n / q
    sd = (
        F.sqrt(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double")
                * F.col("s").cast("double")
                / n
            )
            / (n - 1.0)
        )
        / q
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        mean.alias("mean_diff"),
        sd.alias("sd_diff"),
        (mean - F.lit(z_crit) * sd).alias("loa_lo"),
        (mean + F.lit(z_crit) * sd).alias("loa_hi"),
    )
