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

from pyspark.sql import DataFrame
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
        F.expr(
            "transform(sequence(1, length(__cen)), "
            "i -> substring(__cen, i, 1))"
        ).alias("__chars"),
    )
    counts = F.expr(
        "transform(array_distinct(__chars), "
        "c -> size(filter(__chars, x -> x = c)))"
    )
    s_micro = F.aggregate(
        counts,
        F.lit(0).cast("bigint"),
        lambda acc, k: acc
        + F.round(k * F.log(k.cast("double")) * 1_000_000).cast("bigint"),
    )
    h = F.when(F.col("n_chars") == 0, F.lit(0.0)).otherwise(
        (
            F.log(F.col("n_chars").cast("double"))
            - (s_micro / 1e6) / F.col("n_chars")
        )
        / F.lit(LN2)
    )
    return step.select(*keep, "n_chars", h.alias(out_col))
