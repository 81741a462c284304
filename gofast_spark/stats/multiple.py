"""Multiple-testing correction (Benjamini-Hochberg FDR).

Public algorithm: Benjamini & Hochberg, "Controlling the False
Discovery Rate" (JRSS-B 1995).  The step-up q-value is

    q_(i) = min_{j >= i} ( m * p_(j) / j ),  clamped at 1

over the p-sorted hypotheses.  The reference's inferential tests
return single p-values (gofast/stats/inferential.py); a metric
platform runs THOUSANDS of them at once (one per segment/metric), and
reading them without FDR control is the classic false-discovery trap —
this is the missing aggregation layer, and it is pure windows: one
``row_number`` + one trailing ``min`` over the hypothesis-sized frame
(hypotheses are segments, never raw rows, so the ordered window is
bounded by construction).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fdr_bh(
    df: DataFrame,
    p_col: str,
    *,
    tiebreak_cols: "list[str] | None" = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Append BH ``rank``, ``q_value`` and ``reject`` to a hypothesis
    frame.  Ties in p break on ``tiebreak_cols`` so ranks are
    deterministic; ``reject = q_value <= alpha`` (step-up decision)."""
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.orderBy(F.col(p_col), *tb)
    ranked = df.withColumn("rank", F.row_number().over(w)).withColumn(
        "__m", F.count(F.lit(1)).over(Window.partitionBy())
    )
    q_raw = (
        F.col(p_col) * F.col("__m").cast("double")
        / F.col("rank").cast("double")
    )
    w_tail = Window.orderBy("rank").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    q = F.least(F.lit(1.0), F.min(q_raw).over(w_tail))
    return (
        ranked.withColumn("q_value", q)
        .withColumn("reject", (F.col("q_value") <= F.lit(alpha)).cast("int"))
        .drop("__m")
    )


def p_two_sided_from_z(z: Column) -> Column:
    """Two-sided normal p-value ``2 * (1 - Phi(|z|)) = 1 - erf(|z|/sqrt(2))``
    via the repo's Abramowitz-Stegun erf polynomial (stats/probs.py),
    so an oracle replays it coefficient-for-coefficient."""
    from gofast_spark.stats.probs import _erf_approx

    return 1.0 - _erf_approx(F.abs(z) / math.sqrt(2.0))


def holm_bonferroni(
    df: DataFrame,
    p_col: str,
    *,
    tiebreak_cols: "list[str] | None" = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Append Holm step-down adjusted p-values and decisions (Holm,
    Scand. J. Statist. 1979) — the FWER-controlling companion of
    :func:`fdr_bh`'s FDR step-up, uniformly more powerful than plain
    Bonferroni:

        p_adj_(i) = max_{j <= i} min(1, (m - j + 1) p_(j))

    via one rank window + a running max.  Ties in p break on
    ``tiebreak_cols`` so ranks are deterministic."""
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.orderBy(F.col(p_col), *tb)
    ranked = df.withColumn("rank", F.row_number().over(w)).withColumn(
        "__m", F.count(F.lit(1)).over(Window.partitionBy())
    )
    adj_raw = F.least(
        F.lit(1.0),
        F.col(p_col)
        * (F.col("__m") - F.col("rank") + F.lit(1)).cast("double"),
    )
    w_head = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p_adj = F.max(adj_raw).over(w_head)
    return (
        ranked.withColumn("p_adj", p_adj)
        .withColumn("reject", (F.col("p_adj") <= F.lit(alpha)).cast("int"))
        .drop("__m")
    )
