"""Per-document character-entropy quality signal.

Low character entropy flags boilerplate, repeated padding, and
machine-generated junk (an established corpus-quality heuristic in the
Gopher/C4 filtering family, complementing the repetition signals in
:mod:`gofast_spark.text.repetition`).  Entropy of the normalized-text
character distribution:

    H = log2(n) - (1/n) * sum_c k_c * log2(k_c)

computed entirely ROW-LOCALLY: the alphabet after
:func:`normalize_text` is at most 37 symbols (``a-z``, ``0-9``,
space), so per-row count arrays beat an explode + per-(doc, char)
groupBy — that shuffle would carry one row per character occurrence,
corpus-length rows at 100 TB, while this plan is a pure projection.

Engine determinism: the inner ``sum k_c ln k_c`` folds over the
first-occurrence order of ``array_distinct``, which DuckDB's
``list_distinct`` does NOT promise to preserve — so each term is
quantized to integer micro-units first and the fold sums exact
integers (order-independent), the same micro-unit trick the money
aggregates and DSIR weights use.  ``ln 2`` is pinned to its nearest
double on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text

LN2 = 0.6931471805599453


def char_entropy_frame(
    df: DataFrame,
    text_col: str,
    *,
    id_cols: list[str] | None = None,
    out_col: str = "entropy",
) -> DataFrame:
    """(id..., n_chars, entropy): per-doc character entropy in
    bits/char.  Pure projection — no shuffle, no UDF; the normalized
    text and its char array materialize once inside the plan."""
    keep = id_cols if id_cols is not None else [c for c in df.columns if c != text_col]
    step = df.select(
        *keep, normalize_text(text_col).alias("__cen")
    ).select(
        *keep,
        F.length("__cen").alias("n_chars"),
        # r15 (guide §1.2): split('') materializes the char array in one
        # native pass — the old per-position substring re-walked the
        # string per char
        F.split(F.col("__cen"), "").alias("__chars"),
    )
    # r15: Σ k·ln k over per-char counts via ONE run-length pass on the
    # SORTED char array (equal chars are adjacent) — the old
    # transform(distinct, c -> size(filter(chars, = c))) ran an
    # interpreted O(|alphabet| x n) scan per document.  The per-run
    # contribution keeps the original rounding (round(k * ln(k) * 1e6)
    # per DISTINCT char, then summed), so s_micro is bit-identical.
    def _contrib(run: Column) -> Column:
        return F.round(
            run * F.log(run.cast("double")) * F.lit(1_000_000)
        ).cast("bigint")

    def _merge(a: Column, x: Column) -> Column:
        same = a["prev"].eqNullSafe(x)
        run = F.when(same, a["run"] + 1).otherwise(F.lit(1))
        acc = F.when(same | (a["run"] == 0), a["acc"]).otherwise(
            a["acc"] + _contrib(a["run"])
        )
        return F.struct(x.alias("prev"), run.alias("run"), acc.alias("acc"))

    s_micro = F.aggregate(
        F.array_sort(F.col("__chars")),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("bigint").alias("acc"),
        ),
        _merge,
        lambda a: F.when(a["run"] > 0, a["acc"] + _contrib(a["run"]))
        .otherwise(a["acc"]),
    )
    h = F.when(F.col("n_chars") == 0, F.lit(0.0)).otherwise(
        (
            F.log(F.col("n_chars").cast("double"))
            - (s_micro / 1e6) / F.col("n_chars")
        )
        / F.lit(LN2)
    )
    return step.select(*keep, "n_chars", h.alias(out_col))


def js_divergence_groups(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats) between the unigram
    token distributions of document groups (Lin, IEEE Trans. IT 1991)
    — the symmetric, bounded corpus-mixing/drift readout data-curation
    pipelines compare sources with.

    Decomposition used (so tokens absent from one side need no outer
    join):  with ``E_s = sum p ln p`` per group and
    ``M = sum m ln m`` over the mixture ``m = (p+q)/2``,

        JSD(P,Q) = E_p/2 + E_q/2 - M
        M = S_shared + (A_p - B_p) + (A_q - B_q)

    where ``A_s = sum_all (p/2) ln(p/2)``, ``S_shared`` and ``B_s``
    are sums over SHARED tokens only of ``m ln m`` and ``(p/2)
    ln(p/2)``.  Shapes: one explode + groupBy (the per-group count
    table), two group-sized rollups, and ONE vocab-sized inner
    self-join for the shared terms — never an outer join, never
    corpus-sized.  Every summand is quantized to nano-units so all
    reductions are exact integers.  Output: ``(g1, g2, jsd)`` for
    every unordered group pair."""
    from gofast_spark.text.analysis import normalize_text

    norm = normalize_text(text_col)
    toks = df.where(F.length(norm) > 0).select(
        F.col(group_col).alias("g"),
        F.explode(F.split(norm, " ")).alias("token"),
    )
    uni = toks.groupBy("g", "token").agg(F.count(F.lit(1)).alias("n"))
    tot = uni.groupBy("g").agg(F.sum("n").alias("nt"))
    p = uni.join(F.broadcast(tot), "g").select(
        "g", "token",
        (F.col("n").cast("double") / F.col("nt").cast("double"))
        .alias("p"),
    )

    def q9(expr):
        return F.floor(expr * F.lit(1e9) + F.lit(0.5)).cast("bigint")

    # per-group sums over ALL tokens: E = sum p ln p, A = sum (p/2) ln (p/2)
    per = p.groupBy("g").agg(
        F.sum(q9(F.col("p") * F.log("p"))).alias("e_u"),
        F.sum(q9(F.col("p") / F.lit(2.0)
                 * F.log(F.col("p") / F.lit(2.0)))).alias("a_u"),
    )

    a = p.select(F.col("g").alias("g1"), "token", F.col("p").alias("pa"))
    b = p.select(F.col("g").alias("g2"), "token", F.col("p").alias("pb"))
    m = (F.col("pa") + F.col("pb")) / F.lit(2.0)
    shared = (
        a.join(b, "token")
        .where(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(
            F.sum(q9(m * F.log(m))).alias("s_u"),
            F.sum(q9(F.col("pa") / F.lit(2.0)
                     * F.log(F.col("pa") / F.lit(2.0)))).alias("ba_u"),
            F.sum(q9(F.col("pb") / F.lit(2.0)
                     * F.log(F.col("pb") / F.lit(2.0)))).alias("bb_u"),
        )
    )
    # every unordered group pair, even token-disjoint ones (their
    # shared sums are empty and the identity collapses to JSD = ln 2)
    ga = per.select(F.col("g").alias("g1"), F.col("e_u").alias("ea_u"),
                    F.col("a_u").alias("aa_u"))
    gb = per.select(F.col("g").alias("g2"), F.col("e_u").alias("eb_u"),
                    F.col("a_u").alias("ab_u"))
    j = (
        ga.join(gb, F.col("g1") < F.col("g2"))
        .join(shared, ["g1", "g2"], "left")
    )
    z = F.lit(0).cast("bigint")
    mix = (F.coalesce(F.col("s_u"), z)
           + (F.col("aa_u") - F.coalesce(F.col("ba_u"), z))
           + (F.col("ab_u") - F.coalesce(F.col("bb_u"), z)))
    jsd = (
        (F.col("ea_u") + F.col("eb_u")).cast("double") / F.lit(2.0)
        - mix.cast("double")
    ) / F.lit(1e9)
    return j.select("g1", "g2", jsd.alias("jsd"))
