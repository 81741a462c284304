"""CUPED variance reduction for A/B experiments.

Deng, Xu, Kohavi & Walker, "Improving the Sensitivity of Online
Controlled Experiments by Utilizing Pre-Experiment Data" (WSDM 2013):
the post-period metric ``y`` is adjusted by the pre-period covariate
``x`` as

    y_adj = y - theta * (x - mean(x)),   theta = cov(x, y) / var(x)

which keeps the treatment-effect estimate unbiased (assignment is
independent of pre-period behavior) while shrinking its variance by
the squared correlation — routinely 30-60% on revenue metrics, i.e.
the same experiment power with half the traffic.  THE standard
sensitivity trick of every large experimentation platform.

Scale shape: one groupBy builds the user-level (x, y) frame from the
event stream (pre/post split by the experiment start date); theta and
mean(x) are ONE 1-row aggregate of that frame broadcast back; the
per-variant report is one final aggregate.  Nothing driver-side, two
shuffles total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuped_report(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    variant_col: str,
    *,
    experiment_start,
) -> DataFrame:
    """Per-variant experiment readout with CUPED adjustment:
    ``(variant, n_users, mean_post, mean_adj, var_post, var_adj,
    var_reduction)`` — ``mean_adj`` is the variance-reduced metric to
    difference between variants; ``var_reduction`` = 1 - var_adj /
    var_post (the sensitivity gained).  Users with no pre-period
    activity carry x = 0 (they still contribute, just without
    adjustment leverage)."""
    ts = F.col(ts_col)
    v = F.col(value_col).cast("double")
    start = F.lit(experiment_start).cast("timestamp")
    per_user = (
        df.where(ts.isNotNull() & v.isNotNull())
        .groupBy(
            F.col(user_col).alias("u"), F.col(variant_col).alias("variant")
        )
        .agg(
            F.sum(F.when(ts < start, v).otherwise(F.lit(0.0))).alias("x"),
            F.sum(F.when(ts >= start, v).otherwise(F.lit(0.0))).alias("y"),
        )
    )
    g = per_user.agg(
        F.avg("x").alias("__mx"),
        F.avg("y").alias("__my"),
        F.avg(F.col("x") * F.col("y")).alias("__mxy"),
        F.avg(F.col("x") * F.col("x")).alias("__mxx"),
    ).select(
        "__mx",
        (
            (F.col("__mxy") - F.col("__mx") * F.col("__my"))
            / (F.col("__mxx") - F.col("__mx") * F.col("__mx"))
        ).alias("__theta"),
    )
    adj = per_user.crossJoin(F.broadcast(g)).withColumn(
        "y_adj",
        F.col("y") - F.col("__theta") * (F.col("x") - F.col("__mx")),
    )
    n = F.count(F.lit(1))
    var_post = F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")
    var_adj = (
        F.avg(F.col("y_adj") * F.col("y_adj"))
        - F.avg("y_adj") * F.avg("y_adj")
    )
    return adj.groupBy("variant").agg(
        n.alias("n_users"),
        F.avg("y").alias("mean_post"),
        F.avg("y_adj").alias("mean_adj"),
        var_post.alias("var_post"),
        var_adj.alias("var_adj"),
        (F.lit(1.0) - var_adj / var_post).alias("var_reduction"),
    )
