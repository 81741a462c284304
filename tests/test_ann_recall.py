"""ANN recall harness: lsh_topk recall@k against brute-force cosine_topk
ground truth on the embeddings fixture, across ``bits`` settings and with
multi-probe — guards the "recall is tunable" claim of the LSH scale path.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"
DIM = 64
K = 10
N_QUERIES = 25


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return df.cache()


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(f"vec_id % 20 = 0").limit(N_QUERIES).cache()


@pytest.fixture(scope="module")
def truth(corpus, queries):
    from gofast_spark.sim import cosine_topk

    gt = cosine_topk(corpus, queries, "vec_id", "embedding", k=K)
    out = {}
    for r in gt.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(approx_df, truth):
    got = {}
    for r in approx_df.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    return hits / total


def test_recall_grows_as_bits_shrink(spark, corpus, queries, truth):
    from gofast_spark.sim import lsh_topk

    recalls = {}
    for bits in (2, 4, 6):
        approx = lsh_topk(
            corpus, queries, "vec_id", "embedding", dim=DIM, bits=bits, k=K
        )
        recalls[bits] = _recall(approx, truth)
    # fewer bits -> bigger buckets -> recall must not degrade
    assert recalls[2] >= recalls[4] >= recalls[6]
    # data-driven floors (synthetic embeddings are near-isotropic, so the
    # absolute numbers sit near the bucket-collision baseline: measured
    # 0.34 / 0.13 / 0.10 at bits 2/4/6 for K=10, N=500)
    assert recalls[2] >= 0.30, recalls
    assert recalls[6] >= 0.05, recalls


def test_multiprobe_lifts_recall(spark, corpus, queries, truth):
    from gofast_spark.sim import lsh_topk

    base = _recall(
        lsh_topk(corpus, queries, "vec_id", "embedding", dim=DIM, bits=4, k=K),
        truth,
    )
    probed = _recall(
        lsh_topk(
            corpus, queries, "vec_id", "embedding",
            dim=DIM, bits=4, k=K, probes=2,
        ),
        truth,
    )
    assert probed >= base
    # 2 extra Hamming-1 probes roughly triple the candidate pool at bits=4
    # (measured lift: 0.13 -> ~0.3 on the synthetic fixture)
    assert probed >= base + 0.05, (base, probed)


def test_multiprobe_pairs_stay_unique(spark, corpus, queries):
    """Each corpus vector lives in exactly one bucket, so multi-probe must
    not introduce duplicate (query, corpus) candidate pairs."""
    from gofast_spark.sim import lsh_topk

    out = lsh_topk(
        corpus, queries, "vec_id", "embedding",
        dim=DIM, bits=4, k=K, probes=3,
    )
    n = out.count()
    assert out.select("query_id", "vec_id").distinct().count() == n


def test_ivf_recall_grows_with_nprobe(spark, corpus, queries, truth):
    from gofast_spark.sim import ivf_topk, train_centroids

    C = train_centroids(corpus, "embedding", nlist=8, seed=3)
    recalls = {}
    for nprobe in (1, 2, 4, 8):
        approx = ivf_topk(
            corpus, queries, "vec_id", "embedding",
            centroids=C, nprobe=nprobe, k=K,
        )
        recalls[nprobe] = _recall(approx, truth)
    # more probed cells -> candidate pool grows monotonically
    assert recalls[1] <= recalls[2] <= recalls[4] <= recalls[8]
    # probing every cell IS brute force: recall must be exact
    assert recalls[8] == 1.0, recalls
    assert recalls[2] >= 0.2, recalls


def test_ivf_cells_partition_corpus(spark, corpus):
    from gofast_spark.sim import assign_cells, train_centroids

    C = train_centroids(corpus, "embedding", nlist=8, seed=3)
    cells = assign_cells(corpus, "embedding", C)
    n = corpus.count()
    assert cells.count() == n  # every vector lands in exactly one cell
    per = {
        r["cell"]: r["n"]
        for r in cells.groupBy("cell")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert sum(per.values()) == n
    assert len(per) >= 4  # k-means actually spreads the data


def test_pq_adc_correlates_with_exact_l2(spark, sf_small):
    """ADC with 4x16 landmark codebooks is a coarse quantizer: on this
    near-isotropic synthetic corpus distances concentrate, so top-5
    overlap with the exact top-5 is legitimately near zero — the
    meaningful invariant is that ADC distances correlate positively
    with exact squared L2 over the whole corpus (observed ~0.39 for
    query 0; an unrelated scoring would sit near 0)."""
    from pyspark.sql import functions as F

    from gofast_spark.sim import pq_topk

    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = e.where(F.col("vec_id") == 0)
    qq = q.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    sq = F.expr(
        "aggregate(zip_with(embedding, __qv, (a, b) -> "
        "(CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) * "
        "(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), 0D, (acc, x) -> acc + x)"
    )
    exact = (
        e.crossJoin(F.broadcast(qq))
        .where(F.col("vec_id") != 0)
        .withColumn("d2", sq)
        .select("vec_id", "d2")
    )
    adc = pq_topk(e, q, "vec_id", "embedding", k=10**9).select(
        "vec_id", "adc_dist"
    )
    corr = exact.join(adc, "vec_id").stat.corr("d2", "adc_dist")
    assert corr >= 0.25
