"""Feature hashing (the "hashing trick"): text -> fixed-dim count
vectors with no trained vocabulary.

Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning" (ICML 2009).  Each token increments cell
``portable_hash(token) mod dim``, so the vectorizer is stateless —
no vocabulary broadcast, no fit pass, identical output on any subset
of the corpus (the property that matters when vectorizing 100 TB in
one pass).  The hash is the engine-portable LCG character hash
(text/hashing.py), so DuckDB reproduces every cell exactly.

Two representations:

* ``hashed_tf_sparse`` — (id, cell, tf) rows: one explode + one
  groupBy; the join-friendly form (sparse dot products, per-cell
  stats) and the one the differential oracle checks.
* ``hashed_tf_vector`` — (id, vec array<double>): the sparse rows
  re-assembled row-locally (map lookup over ``sequence(0, dim-1)``),
  optionally L2-normalized — drop-in input for the sim/ layer
  (cosine_topk, LSH, IVF, semantic_dedup), giving embedding-style
  operators over corpora with no embedding model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text
from gofast_spark.text.hashing import char_hash


def hashed_tf_sparse(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """(id, cell, tf): token counts per hash cell, cells 0..dim-1."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("__tok"),
    ).where(F.col("__tok") != "")
    return (
        toks.withColumn("cell", F.pmod(char_hash("__tok"), F.lit(dim)))
        .groupBy(id_col, "cell")
        .agg(F.count("*").alias("tf"))
    )


def hashed_tf_vector(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """(id, vec): dense ``array<double>`` per document, cells in order;
    ``normalize`` scales to unit L2 (cosine-ready).  Docs with no
    tokens are absent (they have no vector, matching the sparse form).
    """
    sparse = hashed_tf_sparse(df, id_col=id_col, text_col=text_col, dim=dim)
    assembled = (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("cell", "tf"))
            ).alias("__m")
        )
        .withColumn(
            "vec",
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                f"i -> CAST(coalesce(__m[i], 0) AS DOUBLE))"
            ),
        )
    )
    if normalize:
        from gofast_spark.sim.cosine import l2_norm

        assembled = assembled.withColumn("__l2", l2_norm(F.col("vec")))
        assembled = assembled.withColumn(
            "vec",
            F.expr("transform(vec, x -> x / __l2)"),
        )
    return assembled.select(id_col, "vec")


def chi2_feature_selection(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    top_k: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Per-class chi-square feature (token) selection (Yang &
    Pedersen, ICML 1997 — the classic text feature-selection study):
    for each (token, class), the chi-square of the 2x2 document
    contingency

        chi2 = N (AD - CB)^2 / ((A+C)(B+D)(A+B)(C+D))

    with A = docs of the class containing the token, using DOCUMENT
    frequencies (each doc counts once per token).  One explode +
    distinct + groupBy builds the (token, class) table; margins are
    vocab-/class-sized rollups; products promote to double from the
    first multiply so int64 never overflows.  Output: the ``top_k``
    tokens per class by chi2 (rounded to 6 for engine-stable ties,
    token tie-break)."""
    from pyspark.sql import Window

    from gofast_spark.text.analysis import normalize_text

    norm = normalize_text(text_col)
    # one row per (doc, DISTINCT token): array_distinct is row-local,
    # so document frequency needs no doc-id key at all
    doc_tokens = (
        df.where(F.length(norm) > 0)
        .select(
            F.col(label_col).alias("cls"),
            F.explode(F.array_distinct(F.split(norm, " "))).alias("token"),
        )
    )
    a = doc_tokens.groupBy("cls", "token").agg(
        F.count(F.lit(1)).alias("df_ct")
    )
    # class sizes and totals come from the DOC counts, not token rows
    docs = df.where(F.length(norm) > 0).select(
        F.col(label_col).alias("cls")
    )
    cls_sizes = docs.groupBy("cls").agg(F.count(F.lit(1)).alias("n_c"))
    total = docs.agg(F.count(F.lit(1)).alias("nn"))
    tok_df = a.groupBy("token").agg(F.sum("df_ct").alias("n_t"))

    j = (
        a.join(F.broadcast(cls_sizes), "cls")
        .join(tok_df, "token")
        .crossJoin(F.broadcast(total))
        .where(F.col("n_t") >= min_df)
    )
    A = F.col("df_ct").cast("double")
    B = (F.col("n_t") - F.col("df_ct")).cast("double")
    C = (F.col("n_c") - F.col("df_ct")).cast("double")
    D = (F.col("nn") - F.col("n_t") - F.col("n_c")
         + F.col("df_ct")).cast("double")
    nn = F.col("nn").cast("double")
    den = (A + C) * (B + D) * (A + B) * (C + D)
    # a token present in every document (or every doc of one class'
    # complement) zeroes a margin: it carries no signal — score 0
    chi2 = F.when(
        den > 0.0,
        nn * (A * D - C * B) * (A * D - C * B) / den,
    ).otherwise(F.lit(0.0))
    scored = j.select(
        "cls", "token", F.col("df_ct").cast("bigint").alias("df_ct"),
        F.round(chi2, 6).alias("chi2"),
    )
    w = Window.partitionBy("cls").orderBy(
        F.col("chi2").desc(), F.col("token")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_k)
        .select("cls", "token", "df_ct", "chi2")
    )
