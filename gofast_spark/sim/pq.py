"""Product-quantization ANN (asymmetric distance computation).

Published algorithm: Jegou, Douze, Schmid — "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011.  Vectors are split into M
subspaces; each subspace is quantized against a small codebook; a query
scores a vector by summing per-subspace lookup-table distances (ADC)
instead of touching the raw floats — the memory/bandwidth trick that
makes billion-vector scans feasible.

Derandomization for differential testing (same recipe as the landmark
IVF in sim/ivf.py): codebooks are NOT k-means — centroid j of every
subspace is the corresponding slice of the corpus vector with the j-th
smallest portable id hash.  Zero training iterations, every step a
relational expression, so the DuckDB oracle reproduces codes, LUTs, and
ranks bit-for-bit.  Landmark codebooks are a COARSE quantizer: on
near-isotropic data ADC ordering correlates positively with exact L2
(~0.4 on the synthetic corpus, guarded in tests/test_ann_recall.py) but
top-k overlap is weak — production should train the codebooks with
sampled k-means (or OPQ) and/or re-rank ADC candidates exactly, both of
which reuse the plan shape below unchanged.

Plan shape / scale notes:

- encode: corpus x codebook broadcast cross join (K rows) -> ONE
  groupBy(id) computing all M argmin codes as lexicographic struct-mins
  (single shuffle; at 100 TB this is the standard one-pass encode,
  or move it into an Arrow-batched ``mapInPandas`` and skip the
  fan-out entirely — the codes are what you persist).
- score: the per-query lookup tables are Q x K rows — broadcast; the
  ADC join chain is M broadcast hash joins, shuffle-free over the
  encoded corpus; top-k is one window per query partition.
- determinism: every floating sum is written in a FIXED left-to-right
  order and emitted as the same expression text on both engines (IEEE
  doubles + identical operation order = identical bits); argmin and
  rank ties break on the cell/corpus id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sq_dist_terms(
    a: str, b: str, offset: int, dims: int, *, indexer: str = "spark"
) -> str:
    """Fixed-order sum of squared differences over one subspace as an
    expression STRING, emitted for either engine (``spark`` uses
    ``element_at``, ``duckdb`` uses bracket indexing).  Elements are
    cast to double first so float[] corpora don't accumulate in float32
    on one engine and float64 on the other."""

    def at(col: str, i: int) -> str:
        if indexer == "spark":
            return f"CAST(element_at({col}, {i}) AS DOUBLE)"
        return f"CAST({col}[{i}] AS DOUBLE)"

    terms = []
    for t in range(1, dims + 1):
        x, y = at(a, offset + t), at(b, offset + t)
        terms.append(f"(({x}) - ({y})) * (({x}) - ({y}))")
    return " + ".join(terms)


def pq_codebook(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_centroids: int = 8,
) -> DataFrame:
    """Landmark codebook: the ``n_centroids`` corpus vectors with the
    smallest portable id hash, numbered 0..n-1 in hash order.  Returns
    (cell int, __cv vector) — one frame reused by every subspace (the
    subspace slices live in the distance expressions, not in the data).
    """
    from gofast_spark.text.hashing import md5_hash64

    h = F.pmod(md5_hash64(F.col(id_col).cast("string")), F.lit(2**31))
    w = Window.orderBy("__h", "__cid")
    return (
        corpus.select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cv"),
            h.alias("__h"),
        )
        .orderBy("__h", "__cid")
        .limit(n_centroids)
        .withColumn("cell", (F.row_number().over(w) - 1).cast("int"))
        .select("cell", "__cv")
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_subspaces: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Encode every vector into M subspace codes: (id, code_0..code_M-1).

    One broadcast cross join against the K-row codebook, then a single
    groupBy(id) whose aggregates are lexicographic struct-mins
    ``min(struct(round(dist_m, 6), cell)).cell`` — all M argmins in one
    shuffle, ties broken by cell index."""
    sub = dim // n_subspaces
    fan = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(codebook)
    )
    aggs = []
    for m in range(n_subspaces):
        d = sq_dist_terms(vec_col, "__cv", m * sub, sub, indexer="spark")
        aggs.append(
            F.min(
                F.struct(
                    F.round(F.expr(d), 6).alias("d"), F.col("cell").alias("c")
                )
            )["c"].alias(f"code_{m}")
        )
    return fan.groupBy(id_col).agg(*aggs)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    dim: int = 64,
    k: int = 5,
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, adc_dist, rank) for the k corpus
    vectors with the smallest approximate squared L2 distance per query.

    The corpus is scanned as CODES ONLY — the raw floats appear in the
    (tiny, broadcast) codebook and lookup tables, never in the per-query
    scan.  ``adc_dist = pd_0 + ... + pd_{M-1}`` in fixed order."""
    qid = query_id_col or id_col
    sub = dim // n_subspaces
    cb = pq_codebook(corpus, id_col, vec_col, n_centroids=n_centroids)
    codes = pq_encode(
        corpus, cb, id_col, vec_col, n_subspaces=n_subspaces, dim=dim
    )

    # per-query lookup tables: Q x K rows, pd_m per subspace
    qv = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    lut = qv.crossJoin(F.broadcast(cb))
    for m in range(n_subspaces):
        d = sq_dist_terms("__qv", "__cv", m * sub, sub, indexer="spark")
        lut = lut.withColumn(f"pd_{m}", F.round(F.expr(d), 6))
    lut = lut.drop("__qv", "__cv")

    out = codes
    for m in range(n_subspaces):
        side = lut.select(
            "query_id" if m == 0 else F.col("query_id"),
            F.col("cell").alias(f"__c{m}"),
            f"pd_{m}",
        )
        on = [F.col(f"code_{m}") == F.col(f"__c{m}")]
        if m > 0:
            on.append(F.col("query_id") == F.col(f"__q{m}"))
            side = side.withColumnRenamed("query_id", f"__q{m}")
        out = out.join(F.broadcast(side), on[0] if m == 0 else on[0] & on[1])
        out = out.drop(f"__c{m}", *( [f"__q{m}"] if m > 0 else [] ))

    adc = F.col("pd_0")
    for m in range(1, n_subspaces):
        adc = adc + F.col(f"pd_{m}")
    out = out.withColumn("adc_dist", adc)
    if exclude_self:
        out = out.where(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("adc_dist", 6).asc(), F.col(id_col).asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("vec_id") if id_col != "vec_id" else id_col,
            "adc_dist",
            "rank",
        )
    )
