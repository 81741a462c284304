"""Exact set-similarity join with prefix filtering (AllPairs/PPJoin).

Public algorithm: Bayardo, Ma & Srikant, "Scaling Up All Pairs
Similarity Search" (WWW 2007); Xiao et al., "Efficient Similarity
Joins for Near Duplicate Detection" (WWW 2008).  The EXACT counterpart
to MinHash-LSH (dedup/minhash.py): every output pair carries its true
Jaccard, and the prefix filter makes exactness affordable — a pair
with ``J(A, B) >= t`` MUST share a token among the first
``|X| - ceil(t |X|) + 1`` tokens of each set under any fixed global
token order, so only prefix tokens are indexed and joined.  Ordering
tokens rarest-first (by document frequency) makes those prefixes the
least-joinable tokens in the corpus, collapsing the candidate count.

Scale shape: one distinct projection, one token-frequency groupBy, a
per-document ranking window (partitioned BY DOCUMENT — each window is
document-sized), ONE equi-join on prefix tokens for candidates, and
one counting join to verify exact intersections.  The final
``J >= t`` filter compares scaled INTEGERS (``10^6 * inter >=
t_ppm * union``), so the cut is engine-exact at any threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
) -> DataFrame:
    """All pairs with word-set Jaccard >= ``threshold``:
    ``(id_a, id_b, n_inter, n_union, jaccard)``, id_a < id_b.

    Tokens come from the repo's normalize recipe (text.analysis);
    documents with no tokens are skipped."""
    from gofast_spark.text.analysis import normalize_text

    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    t_ppm = int(round(threshold * 1_000_000))
    norm = normalize_text(F.col(text_col))
    toks = (
        df.where(F.col(text_col).isNotNull() & (F.length(norm) > 0))
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(norm, " ")).alias("tok"),
        )
        .distinct()
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("id").orderBy("df", "tok")
    ranked = (
        toks.join(freq, "tok")
        .withColumn("pos", F.row_number().over(w_doc))
        .join(sizes, "id")
    )
    prefix_len = (
        F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + F.lit(1)
    )
    prefix = ranked.where(F.col("pos") <= prefix_len).select("id", "tok")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    ta = toks.select(F.col("id").alias("id_a"), "tok")
    tb = toks.select(F.col("id").alias("id_b"), "tok")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    scored = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).alias(
                "n_union"
            ),
        )
    )
    # integer threshold: 1e6 * inter >= t_ppm * union  (exact cut)
    out = scored.where(
        F.lit(1_000_000) * F.col("n_inter")
        >= F.lit(t_ppm) * F.col("n_union")
    )
    return out.select(
        "id_a",
        "id_b",
        "n_inter",
        "n_union",
        (
            F.col("n_inter").cast("double")
            / F.col("n_union").cast("double")
        ).alias("jaccard"),
    )
