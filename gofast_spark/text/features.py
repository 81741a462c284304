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
