"""Always-valid sequential inference (mSPRT) for streaming A/B tests.

Public algorithm: the mixture sequential probability ratio test of
Johari, Koomen, Pekelis & Walsh, "Peeking at A/B Tests: Why it matters,
and what to do about it" (KDD 2017) / "Always Valid Inference" (arXiv
1512.04922).  A normal mixture over the effect gives the closed-form
likelihood ratio at analysis time ``n``::

    Lambda_n = sqrt(V_n / (V_n + tau^2))
               * exp(theta_hat_n^2 * tau^2 / (2 V_n (V_n + tau^2)))

where ``theta_hat_n`` is the cumulative treatment-control mean
difference, ``V_n = s_a^2/n_a + s_b^2/n_b`` its variance estimate, and
``tau^2`` the mixture variance.  The always-valid p-value is the
running minimum ``p_n = min(1, min_{m<=n} 1/Lambda_m)`` — valid at
EVERY peek, so a dashboard can read it daily without alpha inflation.

Spark-first shape: the reference has no sequential-testing surface
(its A/B helpers are one-shot t-tests, gofast/stats/inferential.py);
this mirrors how the repo's CUPED readout (stats/cuped.py) extends the
same family.  ONE groupBy(day, variant) over the raw events folds
everything to exact integer milli-unit sums; every subsequent window
runs over the days-sized table, so the full peeking curve for 100 TB
of events costs one scan.  All doubles derive from exact integers in a
fixed expression order, so a SQL oracle reproduces the curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def msprt_curve(
    df: DataFrame,
    ts_col: str,
    variant_col: str,
    value_col: str,
    *,
    control: str,
    treatment: str,
    tau2: float = 0.01,
) -> DataFrame:
    """Daily always-valid p-value curve for the difference in means
    (treatment - control).

    Returns one row per day with cumulative sample sizes, the running
    effect estimate, ``Lambda`` and the always-valid ``p_value``
    (monotone non-increasing).  Values are quantized to exact integer
    milli-units before aggregation so the curve is engine-portable."""
    per_day = msprt_day_moments(
        df, ts_col, variant_col, value_col,
        control=control, treatment=treatment,
    )
    return msprt_from_day_moments(per_day, tau2=tau2)


def msprt_day_moments(
    df: DataFrame,
    ts_col: str,
    variant_col: str,
    value_col: str,
    *,
    control: str,
    treatment: str,
) -> DataFrame:
    """Per-day integer moment state ``(day, n_t, n_c, s_t, s_c, ss_t,
    ss_c)`` — the exactly-maintainable mSPRT state: a plain groupBy(day)
    aggregate, so a STREAM can hold it as complete-mode state and the
    drained table folds to the identical curve
    (:func:`msprt_from_day_moments`)."""
    x3 = F.floor(F.col(value_col).cast("double") * 1e3 + F.lit(0.5)).cast(
        "bigint"
    )
    is_t = F.col(variant_col) == treatment
    day = F.to_date(F.col(ts_col))
    return (
        df.where(
            F.col(value_col).isNotNull()
            & F.col(variant_col).isin([control, treatment])
        )
        .groupBy(day.alias("day"))
        .agg(
            F.sum(F.when(is_t, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(~is_t, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(is_t, x3).otherwise(F.lit(0))).alias("s_t"),
            F.sum(F.when(~is_t, x3).otherwise(F.lit(0))).alias("s_c"),
            # widen BEFORE the multiply: decimal(19)^2 -> decimal(38,0),
            # exact far past bigint range, so the squared-milli-unit sum
            # never overflows at scale.
            F.sum(
                F.when(is_t, x3.cast("decimal(19,0)") * x3).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("ss_t"),
            F.sum(
                F.when(~is_t, x3.cast("decimal(19,0)") * x3).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("ss_c"),
        )
    )


def msprt_from_day_moments(per_day: DataFrame, *, tau2: float) -> DataFrame:
    """The mSPRT fold from per-day integer moments ``(day, n_t, n_c,
    s_t, s_c, ss_t, ss_c)`` — milli-unit sums and decimal squared sums
    per variant per day.  Split out so a STREAM can maintain exactly
    this state (one days-sized complete-mode aggregate) and the drained
    counts fold to the identical always-valid curve."""
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_day.select(
        "day",
        F.sum("n_t").over(w).alias("cn_t"),
        F.sum("n_c").over(w).alias("cn_c"),
        F.sum("s_t").over(w).alias("cs_t"),
        F.sum("s_c").over(w).alias("cs_c"),
        F.sum("ss_t").over(w).cast("double").alias("css_t"),
        F.sum("ss_c").over(w).cast("double").alias("css_c"),
    ).where((F.col("cn_t") >= 2) & (F.col("cn_c") >= 2))
    # milli-units -> natural units: mean = cs/1e3/n; var from the exact
    # integer moments, sample (n-1) denominator, in one fixed order.
    nt, nc = F.col("cn_t").cast("double"), F.col("cn_c").cast("double")
    st, sc = F.col("cs_t").cast("double"), F.col("cs_c").cast("double")
    mean_t = st / nt / F.lit(1e3)
    mean_c = sc / nc / F.lit(1e3)
    var_t = (F.col("css_t") - st * st / nt) / (nt - F.lit(1.0)) / F.lit(1e6)
    var_c = (F.col("css_c") - sc * sc / nc) / (nc - F.lit(1.0)) / F.lit(1e6)
    theta = mean_t - mean_c
    v = var_t / nt + var_c / nc
    lam = F.sqrt(v / (v + F.lit(tau2))) * F.exp(
        theta * theta * F.lit(tau2) / (F.lit(2.0) * v * (v + F.lit(tau2)))
    )
    scored = cum.select(
        "day",
        F.col("cn_t").alias("n_treatment"),
        F.col("cn_c").alias("n_control"),
        theta.alias("theta"),
        lam.alias("likelihood_ratio"),
    )
    w_all = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = F.least(
        F.lit(1.0), F.lit(1.0) / F.max("likelihood_ratio").over(w_all)
    )
    return scored.withColumn("p_value", p).select(
        "day",
        "n_treatment",
        "n_control",
        "theta",
        "likelihood_ratio",
        "p_value",
    )
