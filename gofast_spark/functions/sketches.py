"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
built-in ``hll_sketch_agg`` family).

The 100-TB story: exact ``count(distinct x)`` re-shuffles raw values for
every grouping you ever want; an HLL sketch is a few KB per group,
partial-aggregatable (map-side combine), and REAGGREGATABLE — daily
sketches union into weekly/monthly estimates without touching raw data
again.  That second property is what ``approx_count_distinct`` alone
does not give you: it returns a number, not a mergeable state.

All functions stay JVM-side (Tungsten DataSketches implementation);
accuracy is the standard HLL bound (~1.6% rsd at the default
lgConfigK=12).
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
