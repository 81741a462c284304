"""Connected-components duplicate clustering (dedup/cluster.py)."""

from __future__ import annotations

from gofast_spark.dedup import (
    connected_components,
    dedup_near_duplicates,
    keep_canonical,
)


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    out = connected_components(pairs)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # diameter-3 chain: hash-min needs several rounds, must still be exact
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(5, 6), (6, 5), (5, 6), (6, 7)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_self_loop_is_singleton(spark):
    got = _cc(spark, [(3, 3), (1, 2)])
    assert got == {1: 1, 2: 1, 3: 3}


def test_keep_canonical_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id bigint, text string"
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4), (5, 4)], "id bigint, cluster_id bigint"
    )
    kept = sorted(
        r["doc_id"] for r in keep_canonical(docs, clusters, "doc_id").collect()
    )
    # 0, 3 unclustered; 1 is min of {1,2}; 4 is min of {4,5}
    assert kept == [0, 1, 3, 4]


def test_dedup_near_duplicates_exact_copies(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content with no overlapping shingles here"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base), (4, other)],
        "doc_id bigint, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_near_duplicates(docs, "doc_id", "text").collect()
    )
    assert kept == [1, 4]


def _cc2(spark, edges):
    from gofast_spark.dedup import connected_components_two_phase

    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    out = connected_components_two_phase(pairs)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_two_phase_matches_hashmin_shapes(spark):
    for edges in (
        [(1, 2), (2, 3), (3, 4)],
        [(10, 11), (11, 12), (20, 21)],
        [(5, 6), (6, 5), (5, 6), (6, 7)],
        [(3, 3), (1, 2)],
    ):
        assert _cc2(spark, edges) == _cc(spark, edges)


def test_two_phase_long_chain_converges_fast(spark):
    """Diameter-120 chain: hash-min would need 120 rounds (its default
    max_iter=50 raises); large-star/small-star reaches the fixpoint in
    O(log^2 n) rounds well inside max_iter=30."""
    import pytest

    from gofast_spark.dedup import connected_components

    edges = [(i, i + 1) for i in range(120)]
    got = _cc2(spark, edges)
    assert got == {i: 0 for i in range(121)}
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=10)


def test_keep_best_prefers_high_score_min_id_tiebreak(spark):
    from pyspark.sql import Row

    from gofast_spark.dedup import keep_best

    df = spark.createDataFrame(
        [
            Row(id=1, s=5, txt="a"),
            Row(id=2, s=9, txt="b"),   # cluster A winner (max score)
            Row(id=3, s=9, txt="c"),   # tie on score -> id 2 wins
            Row(id=10, s=1, txt="d"),  # unclustered -> survives
            Row(id=20, s=0, txt="e"),  # cluster B
            Row(id=21, s=4, txt="f"),  # cluster B winner
        ]
    )
    clusters = spark.createDataFrame(
        [Row(id=1, cluster_id=1), Row(id=2, cluster_id=1),
         Row(id=3, cluster_id=1), Row(id=20, cluster_id=20),
         Row(id=21, cluster_id=20)]
    )
    out = {r["id"] for r in keep_best(df, clusters, "id", "s").collect()}
    assert out == {2, 10, 21}
