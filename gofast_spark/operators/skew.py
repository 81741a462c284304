"""Skew mitigation for aggregations and joins at cluster scale.

AQE splits skewed *sort-merge join* partitions at runtime, but a
``groupBy`` on a skewed key still funnels every row of a hot key through
one reducer, and a broadcast-impossible join against a skewed build side
still stalls on its hottest partition.  The classic rewrites:

- :func:`salted_group_agg` — two-stage aggregation: stage 1 groups on
  ``(key, salt)`` so a hot key spreads over ``salt`` reducers (with
  map-side partial aggregation as usual), stage 2 re-combines the
  partials per key.  Works for any aggregate that decomposes
  associatively: count/sum/min/max re-combine with sum/sum/min/max,
  avg re-combines as sum-of-sums over sum-of-counts.
- :func:`salted_join` — replicate the small side ``salt`` times with an
  explicit salt column and spread the big side's hot keys across the
  replicas; an equi-join on ``(key, salt)`` then has no hot partition.

Both are pure plan rewrites (no actions, no UDFs); results are exactly
equal to the unsalted plan — asserted against the SQL oracle in the
catalog.

Reference: net-new scale surface (the reference is single-node pandas and
has no shuffle concept); published Spark skew idiom.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (stage-1 partial expression, stage-2 combiner) per supported aggregate
_COMBINERS = {
    # count('*') counts rows; count(col) must skip NULLs exactly like the
    # unsalted groupBy(...).agg(count(col)) plan would
    "count": (
        lambda c: F.count(F.lit(1)) if c == "*" else F.count(F.col(c)),
        F.sum,
    ),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_group_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: dict[str, str] | Sequence[tuple[str, str]],
    *,
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage salted aggregation, exactly equal to
    ``df.groupBy(keys).agg(...)`` but with hot keys spread over ``salt``
    stage-1 reducers.

    ``aggs`` maps column -> one of count/sum/min/max/avg (or a sequence
    of ``(col, fn)`` pairs when one column needs several aggregates);
    outputs are aliased ``{col}_{fn}`` (``n`` for ``('*', 'count')``).
    The salt is ``int(rand(seed) * salt)`` — deterministic per partition
    under task retry, and any routing yields the same combined result.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    pairs = list(aggs.items()) if isinstance(aggs, dict) else list(aggs)
    stage1_cols, stage2_cols = [], []
    for c, fn in pairs:
        name = "n" if c == "*" and fn == "count" else f"{c}_{fn}"
        if fn == "avg":
            stage1_cols += [
                F.sum(c).alias(f"__s_{c}"),
                F.count(c).alias(f"__c_{c}"),
            ]
            stage2_cols.append(
                (F.sum(f"__s_{c}") / F.sum(f"__c_{c}")).alias(name)
            )
        elif fn in _COMBINERS:
            partial, combine = _COMBINERS[fn]
            tmp = f"__p_{name}"
            stage1_cols.append(partial(c).alias(tmp))
            stage2_cols.append(combine(tmp).alias(name))
        else:
            raise ValueError(f"unsupported agg {fn!r} (not decomposable)")
    salted = df.withColumn(
        "__salt", (F.rand(seed) * salt).cast("int")
    )
    stage1 = salted.groupBy(*key_list, "__salt").agg(*stage1_cols)
    return stage1.groupBy(*key_list).agg(*stage2_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    *,
    salt: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the (broadcast-unfriendly but replicable)
    ``small`` side is exploded ``salt`` times, the ``big`` side gets a
    random salt per row, and the join runs on ``(keys..., salt)`` — every
    hot key's rows spread over ``salt`` partitions instead of one.

    Result equals ``big.join(small, on, how)`` for one-row-per-key small
    sides (the dimension-join shape); replication factor is ``salt``.

    Only ``how`` variants that preserve semantics under small-side
    replication are accepted: inner / left / left_semi / left_anti.  A
    right or full join would emit every unmatched small row once per
    replica (``salt`` duplicates), so those raise instead of silently
    returning wrong results — use AQE skew-join for those shapes.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: unmatched "
            f"small-side rows would be duplicated once per salt replica; "
            f"use an unsalted join with AQE skew handling instead"
        )
    key_list = [on] if isinstance(on, str) else list(on)
    b = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return b.join(s, on=[*key_list, "__salt"], how=how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_cols: str | Sequence[str],
    *,
    top_k: int = 20,
) -> DataFrame:
    """Diagnose key skew BEFORE choosing a mitigation: one row per
    heavy-hitter key with its row count, share of the table, and the
    ratio to a perfectly uniform key (the quantity that decides whether
    salting / AQE skew-split is worth it).

    One aggregation pass: groupBy(key) count (map-side partial), then
    the global totals ride a broadcast single-row cross join — no
    driver collect, no second scan of the raw table.  ``top_k`` keys by
    count are returned; feed the worst offenders' ratios into
    :func:`salted_group_agg`'s ``salt`` parameter (a key at ratio R
    wants roughly R-way salting to flatten its reducer).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    # top-k selection via orderBy+limit compiles to TakeOrderedAndProject
    # (distributed partial top-k, merged on the driver) — a global
    # row_number window here would pull EVERY distinct key through one
    # reducer, the exact pathology this report diagnoses.  The rank
    # window then runs over the top_k survivors only (bounded frame).
    top = counts.orderBy(
        F.col("n_rows").desc(), *[F.col(k) for k in keys]
    ).limit(top_k)
    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("share", F.col("n_rows") / F.col("__total"))
        .withColumn(
            "uniform_ratio",
            F.col("n_rows") / (F.col("__total") / F.col("__n_keys")),
        )
        .withColumn("rank", F.row_number().over(w))
        .drop("__total", "__n_keys")
    )
