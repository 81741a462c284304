"""Blocked record linkage (entity resolution) over string identity
columns.

The classic two-stage shape (Fellegi-Sunter tradition, as implemented
by every dedupe/linkage system): a cheap BLOCKING key bounds the
candidate space to within-block pairs (an equi-join — never corpus²),
then an edit-distance comparison scores each candidate.  Levenshtein
runs JVM-side (built-in ``levenshtein``); the blocking key here is the
first ``block_tokens`` tokens of the normalized name — swap in any
expression (phonetic code, sorted-token prefix) via ``block_expr``.

Reference parity: the reference's fuzzy string tooling
(gofast/utils/text.py similarity helpers) is single-node pairwise;
this is the distributed blocked variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    block_tokens: int = 2,
    max_dist: int = 3,
    block_expr: Column | None = None,
) -> DataFrame:
    """(id_a, id_b, dist): within-block candidate pairs whose
    normalized-name Levenshtein distance is <= ``max_dist``
    (id_a < id_b).  Cost is Σ block², never corpus² — pick a blocking
    key tight enough that blocks stay bounded (AQE's skew-join split
    handles stragglers)."""
    nm = normalize_text(name_col)
    blk = (
        block_expr
        if block_expr is not None
        else F.array_join(F.slice(F.split(nm, " "), 1, block_tokens), "|")
    )
    base = df.select(
        F.col(id_col).alias("__id"), nm.alias("__nm"), blk.alias("__blk")
    )
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col("__nm").alias("__nm_a"),
        F.col("__blk").alias("__blk_a"),
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col("__nm").alias("__nm_b"),
        F.col("__blk").alias("__blk_b"),
    )
    return (
        a.join(
            b,
            (F.col("__blk_a") == F.col("__blk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__nm_a", "__nm_b").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
