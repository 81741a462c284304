"""Unit tests: item-to-item cosine neighbors (ml/recommend.py)."""

from __future__ import annotations

import math

import pytest


def test_item_similarity_matches_brute_force(spark):
    from gofast_spark.ml.recommend import item_similarity_topk

    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["a", "c"],
        4: ["b", "c", "d"],
        5: ["a", "d"],
        6: ["c", "d"],
    }
    rows = [(bk, it) for bk, its in baskets.items() for it in its]
    df = spark.createDataFrame(rows, "bk int, it string")
    got = item_similarity_topk(df, "bk", "it", min_count=1, k=2).collect()

    # brute force
    items = sorted({it for its in baskets.values() for it in its})
    n = {i: sum(i in its for its in baskets.values()) for i in items}
    co = {}
    for its in baskets.values():
        for i in its:
            for j in its:
                if i < j:
                    co[(i, j)] = co.get((i, j), 0) + 1
    expect = {}
    for i in items:
        neigh = []
        for j in items:
            if i == j:
                continue
            nb = co.get((min(i, j), max(i, j)), 0)
            if nb:
                neigh.append((nb / math.sqrt(n[i] * n[j]), j, nb))
        neigh.sort(key=lambda t: (-t[0], t[1]))
        expect[i] = neigh[:2]
    by_item = {}
    for r in got:
        by_item.setdefault(r["item"], []).append(r)
    for i, exp in expect.items():
        rs = sorted(by_item.get(i, []), key=lambda r: r["rank"])
        assert len(rs) == len(exp)
        for r, (cos, j, nb) in zip(rs, exp):
            assert r["neighbor"] == j and r["n_both"] == nb
            assert r["cosine"] == pytest.approx(cos, rel=1e-12)
            assert r["n_item"] == n[i] and r["n_neighbor"] == n[j]


def test_item_similarity_min_count_prunes(spark):
    from gofast_spark.ml.recommend import item_similarity_topk

    rows = [(1, "a"), (1, "rare"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "bk int, it string")
    got = item_similarity_topk(df, "bk", "it", min_count=2, k=5).collect()
    names = {r["item"] for r in got} | {r["neighbor"] for r in got}
    assert "rare" not in names
    assert {r["item"] for r in got} == {"a", "b"}


def test_item_similarity_duplicate_incidence_collapses(spark):
    """Multiple lines of the same item in one basket count once."""
    from gofast_spark.ml.recommend import item_similarity_topk

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "bk int, it string")
    got = item_similarity_topk(df, "bk", "it", min_count=1, k=1).collect()
    for r in got:
        assert r["n_both"] == 2 and r["cosine"] == pytest.approx(1.0)
