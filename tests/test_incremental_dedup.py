"""Cross-corpus incremental dedup (dedup/incremental.py) vs brute force."""

from __future__ import annotations

import itertools

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


NEW = [
    (1, "the quick brown fox jumps over the lazy dog near the river"),
    (2, "an entirely different sentence about spark clusters and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog near the creek"),
]
REF = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (9, "pandas dataframes live on a single node and spill to swap"),
    (10, "an entirely different sentence about spark clusters and shuffles"),
]


def _shingles(text: str, k: int = 3) -> set:
    toks = text.split()
    if len(toks) < k:
        return {"|".join(toks)}
    return {"|".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute_pairs(threshold: float = 0.5):
    out = set()
    for (ni, nt), (ri, rt) in itertools.product(NEW, REF):
        a, b = _shingles(nt), _shingles(rt)
        j = len(a & b) / len(a | b)
        if j >= threshold:
            out.add((ni, ri))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    ref = spark.createDataFrame(REF, ["doc_id", "text"])
    return new, ref


def test_pairs_between_match_brute_force(frames):
    from gofast_spark.dedup.incremental import near_dup_pairs_between

    new, ref = frames
    got = {
        (r["new_id"], r["ref_id"])
        for r in near_dup_pairs_between(
            new, ref, "doc_id", "text", threshold=0.5
        ).collect()
    }
    # LSH can only MISS brute-force pairs (banding is probabilistic),
    # never invent them; on these high-overlap docs 8 bands find all
    assert got == _brute_pairs(0.5)
    # id namespaces are independent: new 1 matched ref 1 (different doc)
    assert (1, 1) in got
    # exact cross-corpus duplicate found
    assert (2, 10) in got


def test_dedup_against_keeps_only_unmatched(frames):
    from gofast_spark.dedup.incremental import dedup_against

    new, ref = frames
    kept = sorted(
        r["doc_id"]
        for r in dedup_against(
            new, ref, "doc_id", "text", threshold=0.5
        ).collect()
    )
    matched_new = {n for n, _ in _brute_pairs(0.5)}
    assert kept == sorted({n for n, _ in NEW} - matched_new)


def test_cross_corpus_plan_is_equi_join_only(frames):
    from gofast_spark.dedup.incremental import near_dup_pairs_between

    new, ref = frames
    plan = _plan(
        near_dup_pairs_between(new, ref, "doc_id", "text", threshold=0.5)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_leakage_safe_split_group_purity(spark):
    """No near-dup cluster may span the train/test boundary, and the
    union of the two sides must be exactly the corpus."""
    from gofast_spark.dedup.cluster import (
        leakage_safe_split,
        near_dup_clusters,
    )

    docs = [
        (i, f"totally unique document number {i} with its own words {i * 7}")
        for i in range(20)
    ]
    # a 3-doc near-dup cluster and a 2-doc one
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs += [(100, base), (101, base + " ok"), (102, base + " yes")]
    docs += [(200, "spark shuffles wide data"), (201, "spark shuffles wide data")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    train, test = leakage_safe_split(
        df, "doc_id", "text", test_ratio=0.5, seed=3, threshold=0.5
    )
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr | te == {d for d, _ in docs}
    assert not (tr & te)
    clusters = near_dup_clusters(df, "doc_id", "text", threshold=0.5)
    by_cluster: dict[int, set[int]] = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["id"])
    assert any(len(v) >= 2 for v in by_cluster.values())
    for members in by_cluster.values():
        sides = {("train" if m in tr else "test") for m in members}
        assert len(sides) == 1, members
