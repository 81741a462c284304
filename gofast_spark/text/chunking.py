"""Sliding-window document chunking (RAG / context-window preparation).

Splitting long documents into fixed-size token windows with overlap is
the front door of both retrieval indexing and training-example
construction (the non-packing counterpart to operators/packing.py,
which concatenates SHORT documents; this module splits LONG ones).

Entirely shuffle-free: window starts are generated row-locally with
``sequence(0, n-1, stride)``, sliced out of the token array with
``transform(... slice ...)``, and fanned out with ONE ``posexplode``.
At 100 TB this runs at scan speed — there is no groupBy, no join, no
UDF, and output rows scale with total tokens / stride.

The last window is kept whenever it contains at least one new token
(starts strictly inside the doc); short documents yield exactly one
chunk.  Chunk ids are (doc_id, chunk_idx) so downstream joins stay
co-partitioned with any doc-keyed frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): (id, chunk_idx, chunk_text, n_tokens,
    tok_start).

    ``chunk_idx`` is 0-based and ordered by position; ``tok_start`` is
    the 0-based token offset of the chunk, so callers can reconstruct
    provenance or re-merge neighbours.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(
        F.col(id_col),
        F.split(normalize_text(text_col), " ").alias("tk"),
    ).withColumn("n_tok", F.size("tk"))
    toks = toks.where(F.col("n_tok") > 0)
    starts = F.expr(f"sequence(0, n_tok - 1, {stride})")
    chunks = F.expr(
        f"transform(sequence(0, n_tok - 1, {stride}), "
        f"s -> slice(tk, s + 1, {chunk_tokens}))"
    )
    out = toks.select(
        id_col,
        "n_tok",
        starts.alias("_starts"),
        F.posexplode(chunks).alias("chunk_idx", "_ctk"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.element_at("_starts", F.col("chunk_idx") + 1).alias("tok_start"),
        F.array_join("_ctk", " ").alias("chunk_text"),
        F.size("_ctk").alias("n_tokens"),
    )
