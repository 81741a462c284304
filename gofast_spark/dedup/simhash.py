"""SimHash document signatures.

Charikar's similarity-preserving hash: each token votes ±1 on every bit of
its (portable) hash; the signature bit is the sign of the vote sum.  Docs
with small Hamming distance between signatures are near-duplicates.

All integer arithmetic (shift/mask/sum) — exactly reproducible in DuckDB
for the differential oracle.  Net-new surface per the builder brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import tokenize_text
from gofast_spark.text.hashing import md5_hash64


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 16,
    out_col: str = "simhash",
) -> DataFrame:
    """(id, simhash) with a ``bits``-wide signature.

    One explode (linear) + one groupBy(id) with ``bits`` sum aggregates
    (map-side partial), then the sign/packing projection.  Token
    multiplicity is kept (frequency-weighted votes), matching the standard
    formulation.  Tie (vote sum == 0) resolves to bit=1 on both engines
    (``>= 0``).

    Input-partitioning contract (same as dedup.minhash
    ``doc_shingle_sets``): pre-spread single-part inputs — the catalog
    does it in ``plans/catalog_llm._docs``; bare small local file scans
    are auto-spread by :func:`gofast_spark.dedup.minhash.spread_small_scan`
    (file-size estimate, no RDD probe), and derived plans pass through
    unchanged.
    """
    from gofast_spark.dedup.minhash import spread_small_scan

    df = spread_small_scan(df)
    toks = df.select(
        F.col(id_col), F.explode(tokenize_text(text_col)).alias("__tok")
    )
    hashed = toks.select(id_col, md5_hash64(F.col("__tok")).alias("__h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.shiftright(F.col("__h"), k).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"__v_{k}")
            for k in range(bits)
        ]
    )
    sig = None
    for k in range(bits):
        bit = F.when(F.col(f"__v_{k}") >= 0, F.lit(2**k)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return votes.select(id_col, sig.cast("bigint").alias(out_col))
