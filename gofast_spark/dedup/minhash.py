"""MinHash + LSH banded near-duplicate detection (bucketed, never O(n²)).

Pipeline (each stage a hash-partitionable DataFrame op):

1. shingle:   text -> normalized token k-grams, distinct per doc (explode —
              linear in corpus size).
2. hash:      portable char hash of each shingle (text.hashing) so DuckDB
              reproduces every signature bit-for-bit.
3. sign:      K minhash values  mh_j = min over shingles of (a_j*h+b_j) mod P
              — one groupBy(doc) with K min() aggregates (map-side partial).
4. band:      K/r band keys; docs sharing any band key become candidates
              via a self equi-join on (band_idx, band_key) — the ONLY join,
              and it is bucketed: cost is sum of squared bucket sizes, not
              n².  AQE's skew-join splitting handles pathological buckets
              (e.g. a boilerplate string shared by millions of docs).
5. verify:    exact shingle-set Jaccard for candidates only.

Scale notes: no crossJoin anywhere; the shuffles key on doc_id / band_key
which are high-cardinality; K=16, r=2 targets ~0.7+ Jaccard (P(candidate)
= 1-(1-j^r)^b).

Reference: net-new per the builder brief (the reference's
``handle_duplicates``, gofast/dataops/quality.py:4677, is exact-only).
Published algorithm: Broder's MinHash / LSH banding (MMDS ch. 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text
from gofast_spark.text.hashing import md5_hash64

# Mersenne prime 2^31-1; (a*h+b) mod P with h < 2^31 keeps every
# intermediate < 2^62 — safe in int64 on both Spark and DuckDB.
MINHASH_P = 2147483647


def _make_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs via two mixed LCGs (Knuth/Numerical
    Recipes multipliers).  Pure Python ints — the same literals are baked
    into both the Spark plan and the DuckDB oracle SQL."""
    out = []
    a, b = 1, 0
    for _ in range(k):
        a = (a * 2654435761 + 1013904223) % MINHASH_P
        b = (b * 22695477 + 1) % MINHASH_P
        out.append((a if a > 0 else 1, b))
    return out


MINHASH_COEFFS: list[tuple[int, int]] = _make_coeffs(16)


def doc_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    hash_col: str = "sh_hash",
) -> DataFrame:
    """(id, shingle_hash) exploded, distinct per doc.

    Shingles are ``|``-joined runs of ``k`` normalized tokens; a doc with
    fewer than ``k`` tokens contributes its whole token string as one
    shingle.  Output has one row per distinct shingle per doc.
    """
    # the shingle projection is compute-heavy; a small source file (one
    # parquet part) would otherwise pin it to one core — spread it before
    # exploding
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)

    # Build k-grams per row from the token array (transform over a
    # sequence of start offsets, slice + array_join per offset) and
    # explode once.  The lambda runs interpreted, but it is strictly
    # per-row — NO shuffle — which beats the alternative
    # posexplode + lead() window by ~10x wall-clock locally and by a
    # full corpus-wide token shuffle at cluster scale (the window must
    # hash-partition and sort every token by (doc, pos); this pipeline
    # stays embarrassingly parallel until the per-doc distinct).  A doc
    # with fewer than k tokens contributes its whole token string as one
    # shingle.
    toks = F.split(normalize_text(text_col), " ")
    base = df.select(
        F.col(id_col), toks.alias("__t"), F.size(toks).alias("__sz")
    )
    sh_arr = F.when(
        F.col("__sz") < k, F.array(F.array_join(F.col("__t"), "|"))
    ).otherwise(
        F.expr(
            f"transform(sequence(0, __sz - {k}), "
            f"i -> array_join(slice(__t, i + 1, {k}), '|'))"
        )
    )
    sh = base.select(F.col(id_col), F.explode(sh_arr).alias("__shingle"))
    # md5-based portable hash folded into [0, 2^31) so the minhash
    # (a*h+b) products stay within int64 on both engines
    h31 = F.pmod(md5_hash64(F.col("__shingle")), F.lit(2**31))
    return sh.select(
        id_col, h31.alias(hash_col)
    ).dropDuplicates([id_col, hash_col])


def minhash_signatures(
    shingle_df: DataFrame,
    id_col: str,
    *,
    hash_col: str = "sh_hash",
    num_hashes: int = 16,
) -> DataFrame:
    """One row per doc with columns ``mh_0..mh_{K-1}``.

    Single groupBy with K min() aggregates — partial aggregation happens
    map-side, so the shuffle carries one K-wide row per doc per partition.
    """
    coeffs = MINHASH_COEFFS[:num_hashes]
    h = F.col(hash_col)
    aggs = [
        F.min(F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P))).alias(f"mh_{j}")
        for j, (a, b) in enumerate(coeffs)
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    *,
    num_hashes: int = 16,
    rows_per_band: int = 2,
) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs sharing >= 1 LSH band key.

    Band key packs ``r`` consecutive minhashes into one int64
    (``mh_{rb} * 2^31 + mh_{rb+1}`` for r=2).  The self-join is an
    equi-join on (band_idx, band_key): bucketed candidate generation.
    """
    n_bands = num_hashes // rows_per_band
    bands = []
    for b in range(n_bands):
        key = F.lit(0).cast("bigint")
        for r in range(rows_per_band):
            key = key * F.lit(2**31) + F.col(f"mh_{b * rows_per_band + r}")
        bands.append(F.struct(F.lit(b).alias("band_idx"), key.alias("band_key")))
    exploded = sig_df.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, "bk.band_idx", "bk.band_key")
    a = exploded.alias("a")
    b_ = exploded.alias("b")
    return (
        a.join(
            b_,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates()
    )


def shingle_jaccard(
    shingle_df: DataFrame,
    pairs_df: DataFrame,
    id_col: str,
    *,
    hash_col: str = "sh_hash",
) -> DataFrame:
    """Exact Jaccard over shingle-hash sets for the given (id_a, id_b)
    pairs: |A ∩ B| via an equi-join on the shingle hash, |A ∪ B| from the
    per-doc set sizes.  Cost scales with candidate count, not corpus²."""
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # unique internal names on each self-join leg avoid ambiguous refs
    xa = shingle_df.select(
        F.col(id_col).alias("__xa_id"), F.col(hash_col).alias("__ha")
    )
    xb = shingle_df.select(
        F.col(id_col).alias("__xb_id"), F.col(hash_col).alias("__hb")
    )
    inter = (
        pairs_df.join(xa, F.col("id_a") == F.col("__xa_id"))
        .join(xb, (F.col("id_b") == F.col("__xb_id")) & (F.col("__ha") == F.col("__hb")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("__na_id"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("__nb_id"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, F.col("id_a") == F.col("__na_id"))
        .join(nb, F.col("id_b") == F.col("__nb_id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    k: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    eager: bool = True,
) -> DataFrame:
    """End-to-end near-duplicate pairs: shingle -> minhash -> LSH bands ->
    exact-Jaccard verify >= threshold.

    The shingle stage feeds signing, both verify legs, and the size
    aggregate — it is persisted so the expensive hash projection runs
    once instead of four times.  With ``eager`` (default) the verified
    pair list — small by construction relative to the shingle frame — is
    materialized via ``localCheckpoint`` while the shingles are cached
    and the shingle frame is **unpersisted before returning**, so
    repeated calls in a long session cannot accumulate executor storage
    (ADVICE r2): a checkpoint holds no CacheManager entry, and its
    blocks are freed by the ContextCleaner once the returned frame is
    garbage-collected — no caller-side ``unpersist`` obligation.
    ``eager=False``
    keeps the whole pipeline lazy and skips the persist entirely (the
    shingle projection then recomputes once per downstream leg)."""
    if not eager:
        sh = doc_shingles(df, id_col, text_col, k=k)
        sig = minhash_signatures(sh, id_col, num_hashes=num_hashes)
        cand = lsh_candidate_pairs(
            sig, id_col, num_hashes=num_hashes, rows_per_band=rows_per_band
        )
        return shingle_jaccard(sh, cand, id_col).where(
            F.col("jaccard") >= threshold
        )
    sh = doc_shingles(df, id_col, text_col, k=k).persist()
    try:
        sig = minhash_signatures(sh, id_col, num_hashes=num_hashes)
        cand = lsh_candidate_pairs(
            sig, id_col, num_hashes=num_hashes, rows_per_band=rows_per_band
        )
        jac = shingle_jaccard(sh, cand, id_col)
        # materialize the small result while shingles are hot
        return jac.where(F.col("jaccard") >= threshold).localCheckpoint(
            eager=True
        )
    finally:
        sh.unpersist()
