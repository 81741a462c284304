"""DSIR importance resampling (text/dsir.py) vs a pure-Python
replication of the same hashed-bucket pipeline."""

from __future__ import annotations

import math

import pytest

from gofast_spark.text.hashing import LCG_A, LCG_C, LCG_M

DIM = 16
ALPHA = 1.0

RAW = [
    (1, "spark streams data fast"),
    (2, "pandas frames on one node"),
    (3, "spark shuffles data wide"),
    (4, "cats and dogs and cats"),
    (5, "spark data pipelines scale"),
    (6, "dogs chase cats daily"),
]
# target corpus: the spark-flavored docs — selection should tilt
# toward raw docs 1/3/5
TARGET = [(101, "spark data"), (102, "spark streams scale")]


def _char_hash(s: str) -> int:
    return (
        sum(
            ord(ch) * ((i * LCG_A + LCG_C) % LCG_M)
            for i, ch in enumerate(s, start=1)
        )
        % LCG_M
    )


def _bucket_counts(docs):
    out: dict[int, int] = {}
    for _, text in docs:
        for tok in text.split():
            b = _char_hash(tok) % DIM
            out[b] = out.get(b, 0) + 1
    return out


def _expected_logweights():
    raw_c = _bucket_counts(RAW)
    tgt_c = _bucket_counts(TARGET)
    rt, tt = sum(raw_c.values()), sum(tgt_c.values())
    llr = {
        b: math.log((tgt_c.get(b, 0) + ALPHA) / (tt + ALPHA * DIM))
        - math.log((raw_c.get(b, 0) + ALPHA) / (rt + ALPHA * DIM))
        for b in range(DIM)
    }
    w = {}
    for did, text in RAW:
        w[did] = sum(
            llr[_char_hash(tok) % DIM] for tok in text.split()
        )
    return w


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, tgt


def test_logweights_match_python(frames):
    from gofast_spark.text.dsir import dsir_logweights

    raw, tgt = frames
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweights(
            raw, tgt, dim=DIM, alpha=ALPHA
        ).collect()
    }
    want = _expected_logweights()
    assert set(got) == set(want)
    for did in want:
        assert got[did] == pytest.approx(want[did], abs=1e-9)


def test_logweights_micro_exact(frames):
    from gofast_spark.text.dsir import dsir_logweights

    raw, tgt = frames
    got = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir_logweights(
            raw, tgt, dim=DIM, alpha=ALPHA, llr_micro=True
        ).collect()
    }
    # micro weights are integer sums of per-bucket micro ratios
    raw_c = _bucket_counts(RAW)
    tgt_c = _bucket_counts(TARGET)
    rt, tt = sum(raw_c.values()), sum(tgt_c.values())
    llr_micro = {
        b: round(
            (
                math.log((tgt_c.get(b, 0) + ALPHA) / (tt + ALPHA * DIM))
                - math.log((raw_c.get(b, 0) + ALPHA) / (rt + ALPHA * DIM))
            )
            * 1e6
        )
        for b in range(DIM)
    }
    for did, text in RAW:
        want = sum(llr_micro[_char_hash(t) % DIM] for t in text.split())
        assert got[did] == want, did


def test_resample_is_topk_of_noised_weights(frames):
    from gofast_spark.text.dsir import (
        dsir_logweights,
        dsir_resample,
        gumbel_noise,
    )
    from pyspark.sql import functions as F

    raw, tgt = frames
    k = 3
    picked = dsir_resample(raw, tgt, k=k, seed=11, dim=DIM).collect()
    assert len(picked) == k
    # recompute the full keyed frame and check the top-k set agrees
    full = (
        dsir_logweights(raw, tgt, dim=DIM)
        .withColumn("key", F.col("logw") + gumbel_noise("doc_id", seed=11))
        .orderBy(F.col("key").desc(), "doc_id")
        .collect()
    )
    assert [r["doc_id"] for r in picked] == [r["doc_id"] for r in full[:k]]
    # deterministic across invocations
    again = dsir_resample(raw, tgt, k=k, seed=11, dim=DIM).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in picked]


def test_resample_tilts_toward_target(frames):
    from gofast_spark.text.dsir import dsir_logweights

    raw, tgt = frames
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweights(raw, tgt, dim=DIM).collect()
    }
    spark_docs = {1, 3, 5}
    worst_spark = min(w[d] for d in spark_docs)
    best_other = max(w[d] for d in set(w) - spark_docs)
    assert worst_spark > best_other
