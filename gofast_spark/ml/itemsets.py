"""Frequent-itemset pair mining with Apriori pruning (market basket).

Agrawal & Srikant, "Fast Algorithms for Mining Association Rules",
VLDB 1994: a pair can only be frequent if BOTH items are — so the
basket self-join that enumerates candidate pairs runs over the
frequent-item-filtered baskets only.  At 100 TB that pruning is the
whole ballgame: the raw pair explosion is quadratic in basket size,
but after the support filter the join touches only items that can
matter, and the per-basket pair count collapses with the item
frequency tail.

Plan shape: one distinct projection (basket, item), one item-support
groupBy, a semi-join-style prune (broadcast when the frequent-item set
is small, gated like every other dim broadcast in the repo), ONE
equi-join on the basket key with ``item_a < item_b`` to canonicalize,
one pair groupBy, and lift from a 1-row broadcast of the basket count.
Top-k is TakeOrderedAndProject with a deterministic
(support DESC, item_a, item_b) tie-break.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def cap_basket_size(
    pruned: DataFrame,
    max_basket_size: int | None,
    *,
    basket_col: str = "bk",
) -> DataFrame:
    """Drop baskets whose post-prune item count exceeds
    ``max_basket_size`` before a basket self-join.

    Apriori pruning bounds the item VOCABULARY but not a single basket:
    one bot user with 10k distinct items contributes ~5e7 pairs from one
    join key — a straggler/OOM at scale no matter how rare.  The guard
    is the standard fix (e.g. Spark MLlib's FPGrowth treats oversized
    transactions the same way: bound the per-key blowup, never let one
    key dominate the shuffle).

    No-silent-caps rule: when the cap binds, the dropped-basket count is
    computed (one basket-sized aggregate) and logged loudly.  When it
    does not bind — the overwhelmingly common case — the input frame is
    returned UNCHANGED (modulo materialization), so no join is added to
    the plan and existing plan-shape CI stays valid.

    The guard's size aggregate is an extra ACTION, so the pruned frame
    is localCheckpoint'd first: the size scan reads the materialized
    partitions, and the downstream pair self-join reads them TWICE
    instead of recomputing the distinct+prune subtree per side — the
    guard then costs roughly what the duplicate subtree used to."""
    if max_basket_size is None:
        return pruned
    if max_basket_size < 2:
        raise ValueError("max_basket_size must be >= 2")
    pruned = pruned.localCheckpoint(eager=True)
    sizes = pruned.groupBy(basket_col).agg(
        F.count(F.lit(1)).alias("__bk_n")
    )
    oversized = sizes.where(F.col("__bk_n") > max_basket_size)
    n_over = oversized.count()
    if n_over == 0:
        return pruned
    logger.warning(
        "cap_basket_size: dropping %d basket(s) larger than %d items "
        "before the pair self-join (no-silent-caps: raise "
        "max_basket_size to include them)",
        n_over,
        max_basket_size,
    )
    return pruned.join(
        oversized.select(basket_col), basket_col, "left_anti"
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 3,
    top_k: int = 20,
    broadcast_limit: int | None = 100_000,
    max_basket_size: int | None = 10_000,
) -> DataFrame:
    """Top-``top_k`` co-occurring item pairs:
    ``(item_a, item_b, n_pair, n_a, n_b, lift)`` over distinct
    (basket, item) incidences; pairs and both items must reach
    ``min_support`` baskets.  ``lift = n_baskets * n_pair /
    (n_a * n_b)`` (>1 means the items attract)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    b = (
        df.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
        )
        .where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    support = b.groupBy("it").agg(F.count(F.lit(1)).alias("n_it"))
    freq = support.where(F.col("n_it") >= min_support)
    if broadcast_limit is not None and freq.count() <= broadcast_limit:
        freq = F.broadcast(freq)
    pruned = cap_basket_size(
        b.join(freq, "it").select("bk", "it", "n_it"), max_basket_size
    )
    pairs = (
        pruned.alias("l")
        .join(pruned.alias("r"), "bk")
        .where(F.col("l.it") < F.col("r.it"))
        .groupBy(
            F.col("l.it").alias("item_a"),
            F.col("r.it").alias("item_b"),
            F.col("l.n_it").alias("n_a"),
            F.col("r.n_it").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_support)
    )
    n_baskets = b.select("bk").distinct().agg(
        F.count(F.lit(1)).alias("__nb")
    )
    return (
        pairs.crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            (
                F.col("__nb").cast("double")
                * F.col("n_pair").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("n_pair").desc(), "item_a", "item_b")
        .limit(top_k)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 3,
    top_pairs: int = 20,
    broadcast_limit: int | None = 100_000,
    max_basket_size: int | None = 10_000,
) -> DataFrame:
    """Directional association rules from the top frequent pairs
    (Agrawal, Imielinski & Swami, SIGMOD 1993): each mined pair yields
    the two rules ``a -> b`` and ``b -> a`` with

        support    = n_pair / n_baskets
        confidence = n_pair / n_antecedent
        lift       = n_baskets * n_pair / (n_a * n_b)

    Built ON TOP of :func:`frequent_pairs` — the Apriori prune and the
    single basket self-join are reused unchanged, the rule expansion is
    a constant-sized union of two projections plus one 1-row broadcast
    basket count.  Confidence/support are single divisions of exact
    integers (engine-exact); rules order by confidence DESC with
    (antecedent, consequent) tie-break.

    Returns ``2 * top_pairs`` rows: ``(antecedent, consequent, n_pair,
    n_ant, n_cons, support, confidence, lift)``.
    """
    fp = frequent_pairs(
        df,
        basket_col,
        item_col,
        min_support=min_support,
        top_k=top_pairs,
        broadcast_limit=broadcast_limit,
        max_basket_size=max_basket_size,
    )
    nb = (
        df.where(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(F.col(basket_col).alias("bk"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("__nb"))
    )
    fwd = fp.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_pair",
        F.col("n_a").alias("n_ant"),
        F.col("n_b").alias("n_cons"),
        "lift",
    )
    rev = fp.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        "n_pair",
        F.col("n_b").alias("n_ant"),
        F.col("n_a").alias("n_cons"),
        "lift",
    )
    rules = fwd.unionByName(rev).crossJoin(F.broadcast(nb))
    return (
        rules.select(
            "antecedent",
            "consequent",
            "n_pair",
            "n_ant",
            "n_cons",
            (
                F.col("n_pair").cast("double")
                / F.col("__nb").cast("double")
            ).alias("support"),
            (
                F.col("n_pair").cast("double")
                / F.col("n_ant").cast("double")
            ).alias("confidence"),
            "lift",
        )
        .orderBy(F.col("confidence").desc(), "antecedent", "consequent")
    )
