"""Composite quality ops with report side-channels (SURVEY §2.8, §3.3).

The reference's ``audit_data`` (gofast/dataops/quality.py:98-325) chains
outliers -> missing -> dates -> scaling -> categorical eagerly, returning
``(df, report)``.  Here each stage composes into ONE lazy plan; the report
is computed from the same aggregation pass that fits the stage statistics
(SURVEY §7.3.3), so the whole audit is two Spark jobs (fit + optional
report), not five materializations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.quality.missing import _is_missing, handle_missing_data
from gofast_spark.quality.outliers import handle_outliers_in
from gofast_spark.quality.scaling import minmax_scale


def verify_data_integrity(df: DataFrame, *, exact: bool = False) -> DataFrame:
    """Integrity report: missing / distinct / outlier counts per numeric col.

    Reference: ``verify_data_integrity`` (gofast/dataops/inspection.py:28)
    returns (is_ok, report frame).  One aggregation pass computes null
    counts and IQR bounds; a second counts out-of-bound rows.  Output:
    (column, n_missing, missing_ratio, n_distinct, n_outliers).

    Scale default: HyperLogLog distinct counts and sketch quantiles
    (``exact=False``) — a profile report doesn't need exact cardinality,
    and the exact N-column count-distinct expands the scan N-fold.
    ``exact=True`` is the oracle-parity path.
    """
    num = [c for c, t in df.dtypes if t in ("double", "float", "int", "bigint")]
    cd = F.countDistinct if exact else F.approx_count_distinct
    pf = F.percentile if exact else F.percentile_approx
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in num:
        aggs += [
            F.sum(_is_missing(df, c).cast("bigint")).alias(f"__m_{c}"),
            cd(F.col(c)).alias(f"__d_{c}"),
            pf(F.col(c), 0.25).alias(f"__q1_{c}"),
            pf(F.col(c), 0.75).alias(f"__q3_{c}"),
        ]
    row = df.agg(*aggs).first()
    out_aggs = []
    for c in num:
        q1, q3 = row[f"__q1_{c}"], row[f"__q3_{c}"]
        if q1 is None:
            out_aggs.append(F.lit(0).cast("bigint").alias(c))
            continue
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        out_aggs.append(
            F.sum(((F.col(c) < lo) | (F.col(c) > hi)).cast("bigint")).alias(c)
        )
    outs = df.agg(*out_aggs).first()
    spark = df.sparkSession
    rows = [
        (
            c,
            int(row[f"__m_{c}"]),
            float(row[f"__m_{c}"]) / (row["__n"] or 1),
            int(row[f"__d_{c}"]),
            int(outs[c] or 0),
        )
        for c in num
    ]
    return spark.createDataFrame(
        rows, "column string, n_missing bigint, missing_ratio double, n_distinct bigint, n_outliers bigint"
    )


def audit_data(
    df: DataFrame,
    *,
    handle_outliers: bool = True,
    handle_missing: bool = True,
    handle_scaling: bool = True,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Composite cleanup: outlier clip -> missing fill -> minmax scale.

    Reference: ``audit_data`` (gofast/dataops/quality.py:98-325); stage
    order preserved for parity (SURVEY §7.3.5).
    """
    num = columns or [c for c, t in df.dtypes if t in ("double", "float")]
    out = df
    if handle_outliers:
        out = handle_outliers_in(out, num, method="iqr", action="clip")
    if handle_missing:
        out = handle_missing_data(out, "fill_mean", columns=num)
    if handle_scaling:
        out = minmax_scale(out, num)
    return out


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / unit-mixing audit for financial columns
    (Benford 1938; Nigrini's auditing methodology).  Returns one row per
    digit 1-9: observed count, observed fraction, the Benford expectation
    ``log10(1 + 1/d)``, and the squared standardized residual whose sum
    is the chi-square statistic against the Benford null.

    Scale shape: first digit = one string expression on ``abs(value)``
    (no log/pow per row), then a 9-group aggregate; the expectation and
    residuals are constants joined onto the 9-row result — the corpus is
    scanned once regardless of size."""
    v = F.abs(F.col(col))
    # first significant digit = first nonzero digit of the canonical
    # string form (scientific notation included: the mantissa leads);
    # valid for any finite nonzero numeric, no per-row log/pow
    digit = F.regexp_extract(v.cast("string"), "([1-9])", 1)
    obs = (
        df.where(v.isNotNull() & (v > 0))
        .select(digit.cast("int").alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    out = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n") / F.col("total")).alias("observed"),
        F.log10(1.0 + 1.0 / F.col("digit")).alias("expected"),
        "total",
    )
    return out.select(
        "digit",
        "n",
        "observed",
        "expected",
        (
            F.pow(F.col("n") - F.col("total") * F.col("expected"), 2)
            / (F.col("total") * F.col("expected"))
        ).alias("chi2_term"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols,
    *,
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity / l-diversity audit of a table under a
    quasi-identifier set (Sweeney, IJUFKS 2002; Machanavajjhala et
    al., TKDD 2007): group rows by the quasi-identifier combination
    and report how close the table is to k-anonymity — the re-
    identification readout PII pipelines run before release.

    ONE groupBy over the quasi-identifier set (plus a per-group
    distinct count when ``sensitive_col`` is given — exact, one extra
    shuffle), then a group-count-sized rollup.  Output: one row
    ``(k, n_groups, n_violating_groups, n_rows_at_risk,
    anonymity_level, l_diversity_min)`` where ``anonymity_level`` is
    the smallest group (the k the table actually satisfies) and
    ``l_diversity_min`` the minimum per-group distinct sensitive
    values (NULL without a sensitive column)."""
    quasi = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    if sensitive_col:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("__l")
        )
    per = df.groupBy(*[F.col(c) for c in quasi]).agg(*aggs)
    out = per.agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .cast("bigint").alias("n_violating_groups"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("bigint").alias("n_rows_at_risk"),
        F.min("__n").cast("bigint").alias("anonymity_level"),
        (F.min("__l") if sensitive_col else F.lit(None))
        .cast("bigint").alias("l_diversity_min"),
    )
    return out


def last_digit_uniformity(
    df: DataFrame,
    value_col: str,
    *,
    quantize: int = 100,
) -> DataFrame:
    """Last-digit uniformity screen (Nigrini's forensic-accounting
    companion to the Benford first-digit profile: genuine transaction
    amounts have ~uniform final digits, while invented or rounded
    figures cluster): chi-square of the last digit of the quantized
    amount against the uniform expectation,

        chi2 = (10 * sum_d o_d^2 - n^2) / n        (dof = 9)

    — the algebraic form that needs only the 10 integer digit counts
    (absent digits contribute zero automatically).  One groupBy over
    the digit, one closed-form division."""
    d = (
        F.floor(
            F.col(value_col).cast("double") * F.lit(float(quantize))
            + F.lit(0.5)
        ).cast("bigint")
        % 10
    )
    per = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(d.alias("__d"))
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    agg = per.agg(
        F.sum("__o").alias("n"),
        F.sum(F.col("__o").cast("decimal(19,0)") * F.col("__o")).alias(
            "o2"
        ),
        F.count(F.lit(1)).alias("digits_seen"),
    )
    n = F.col("n").cast("decimal(38,0)")
    chi2 = (
        F.lit(10).cast("decimal(38,0)") * F.col("o2") - n * n
    ).cast("double") / F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("digits_seen").cast("bigint").alias("digits_seen"),
        chi2.alias("chi2"),
        F.lit(9).cast("bigint").alias("dof"),
    )


def outlier_consensus(
    df: DataFrame,
    value_col: str,
    *,
    quantize: int = 1000,
    z_cut: float = 3.0,
) -> DataFrame:
    """Consensus of the three classic univariate outlier detectors —
    z-score (|x - mean| > 3 sd), Tukey IQR fences (1.5 IQR beyond the
    quartiles), and the MAD rule (0.6745 |x - med| / MAD > 3.5,
    Iglewicz & Hoaglin 1993) — the ensemble vote the reference's
    quality auditors tabulate before trusting any single rule (each
    detector has a known blind spot: the z-score masks under heavy
    contamination, the fences over-flag skewed data, MAD collapses on
    >50% ties).

    Determinism: quartiles and the deviation median are LOWER order
    statistics by integer rank (:func:`gofast_spark.stats.descriptive
    .integer_rank_quantiles`); the IQR and MAD rules are evaluated in
    PURE INTEGER inequalities (2x < 2Q1 - 3IQR; 6745 |x - med| >
    35000 MAD), so only the z rule touches doubles (closed form over
    integer moments).  Three passes over the quantized column
    (moments+quartiles, deviation median, final vote count) — the
    multi-statistic price, each pass a scan + tiny broadcast.
    Returns one row ``(n, n_z, n_iqr, n_mad, n_consensus2,
    n_consensus3)``."""
    from gofast_spark.stats.descriptive import integer_rank_quantiles

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
    quarts = integer_rank_quantiles(base, 4)
    qrow = quarts.groupBy("__n").agg(
        F.max(F.when(F.col("__i") == 1, F.col("__q"))).alias("q1"),
        F.max(F.when(F.col("__i") == 2, F.col("__q"))).alias("med"),
        F.max(F.when(F.col("__i") == 3, F.col("__q"))).alias("q3"),
    ).drop("__n")
    dev = base.crossJoin(F.broadcast(qrow.select("med"))).select(
        F.abs(F.col("__x") - F.col("med")).alias("__x")
    )
    madrow = (
        integer_rank_quantiles(dev, 2)
        .where(F.col("__i") == 1)
        .select(F.col("__q").alias("mad"))
    )
    stats = (
        mom.crossJoin(F.broadcast(qrow)).crossJoin(F.broadcast(madrow))
    )
    j = base.crossJoin(F.broadcast(stats))
    n = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n
    sd = F.sqrt(
        (
            F.col("__ss").cast("double")
            - F.col("__s").cast("double") * F.col("__s").cast("double") / n
        )
        / (n - 1.0)
    )
    z_flag = (
        F.abs(F.col("__x").cast("double") - mean) > F.lit(z_cut) * sd
    ).cast("int")
    iqr = F.col("q3") - F.col("q1")
    iqr_flag = (
        (F.col("__x") * 2 < F.col("q1") * 2 - iqr * 3)
        | (F.col("__x") * 2 > F.col("q3") * 2 + iqr * 3)
    ).cast("int")
    mad_flag = F.when(
        F.col("mad") > 0,
        (
            F.abs(F.col("__x") - F.col("med")) * 6745
            > F.col("mad") * 35000
        ).cast("int"),
    ).otherwise(F.lit(0))
    votes = z_flag + iqr_flag + mad_flag
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(z_flag).alias("n_z"),
        F.sum(iqr_flag).alias("n_iqr"),
        F.sum(mad_flag).alias("n_mad"),
        F.sum((votes >= 2).cast("int")).alias("n_consensus2"),
        F.sum((votes >= 3).cast("int")).alias("n_consensus3"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_z").cast("bigint").alias("n_z"),
        F.col("n_iqr").cast("bigint").alias("n_iqr"),
        F.col("n_mad").cast("bigint").alias("n_mad"),
        F.col("n_consensus2").cast("bigint").alias("n_consensus2"),
        F.col("n_consensus3").cast("bigint").alias("n_consensus3"),
    )
