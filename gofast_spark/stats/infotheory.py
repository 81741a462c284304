"""Discrete information-theory statistics: entropy, mutual information,
Theil's uncertainty coefficient.

Reference surface: the reference computes association/dependency
measures over categorical pairs driver-side (gofast/stats — Cramer's V
and friends in relationships/inferential; the information-theoretic
variants complete that family).  Here everything derives from ONE
contingency aggregate: H(X), H(Y), H(X,Y) are all functions of the
(x, y) count table, and

    MI(X; Y)  = H(X) + H(Y) - H(X, Y)          (Shannon 1948)
    U(X | Y)  = MI(X; Y) / H(X)                (Theil 1970)

Determinism discipline: every entropy is computed as
``ln N - (1/N) * sum n ln n`` with the ``n ln n`` summands quantized to
micro-units BEFORE the integer sum (the repo's transcendental-sum
recipe, shared with the diversity entries), then the entropy itself is
presented in micro-units — so MI in micro-units is pure INTEGER
arithmetic ``hx_u6 + hy_u6 - hxy_u6`` and replays exactly in any
engine."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _entropy_u6(counts: DataFrame, n_col: str = "n") -> DataFrame:
    """One row ``(n, h_u6)`` from a ``(key..., n)`` count frame:
    ``H = ln N - (sum q6(n ln n)) / 1e6 / N`` quantized to micro-units.
    The count frame is vocabulary-sized; this adds one aggregate."""
    nn = F.col(n_col).cast("double")
    snln = F.sum(
        F.floor(nn * F.log(nn) * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    )
    agg = counts.agg(
        F.sum(F.col(n_col)).cast("bigint").alias("n"),
        snln.alias("__snln"),
    )
    h = F.log(F.col("n").cast("double")) - F.col("__snln").cast(
        "double"
    ) / F.lit(1e6) / F.col("n").cast("double")
    return agg.select(
        "n",
        F.floor(h * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("h_u6"),
    )


def entropy_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Joint information-theory report for two categorical columns in
    one scan: ``(n, hx_u6, hy_u6, hxy_u6, mi_u6, theil_u_xy)`` where
    ``mi_u6 = hx_u6 + hy_u6 - hxy_u6`` (exact integers) and
    ``theil_u_xy = U(X|Y) = MI / H(X)`` (one division of two integers —
    deterministic double).

    Plan shape: ONE groupBy((x, y)) touches the raw data; the x and y
    margins re-aggregate the vocabulary-sized joint table.  At 100 TB
    the joint table is |X| * |Y| rows — the only shuffle is the joint
    groupBy (map-side combined)."""
    xy = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hxy = _entropy_u6(xy).select(
        F.col("n"), F.col("h_u6").alias("hxy_u6")
    )
    hx = _entropy_u6(
        xy.groupBy("x").agg(F.sum("n").alias("n"))
    ).select(F.col("h_u6").alias("hx_u6"))
    hy = _entropy_u6(
        xy.groupBy("y").agg(F.sum("n").alias("n"))
    ).select(F.col("h_u6").alias("hy_u6"))
    out = hxy.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    mi = F.col("hx_u6") + F.col("hy_u6") - F.col("hxy_u6")
    return out.select(
        "n",
        "hx_u6",
        "hy_u6",
        "hxy_u6",
        mi.alias("mi_u6"),
        F.when(F.col("hx_u6") > 0,
               mi.cast("double") / F.col("hx_u6").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("theil_u_xy"),
    )
