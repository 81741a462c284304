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


def test_mega_basket_capped_before_pair_join(spark, caplog):
    """One planted bot basket above max_basket_size is dropped from the
    pair join (and logged — no-silent-caps), leaving the organic pairs
    intact; with the cap above the basket size, results are unchanged."""
    import logging

    from gofast_spark.ml.itemsets import frequent_pairs
    from gofast_spark.ml.recommend import item_similarity_topk

    organic = [(b, it) for b in (1, 2, 3) for it in ("a", "b")]
    bot = [(99, f"x{i}") for i in range(50)] + [(99, "a"), (99, "b")]
    df = spark.createDataFrame(organic + bot, "bk int, it string")

    with caplog.at_level(logging.WARNING, "gofast_spark.ml.itemsets"):
        capped = frequent_pairs(
            df, "bk", "it", min_support=1, top_k=100, max_basket_size=10
        ).collect()
    assert any("dropping 1 basket" in r.message for r in caplog.records)
    ab = [r for r in capped if (r["item_a"], r["item_b"]) == ("a", "b")]
    assert len(ab) == 1 and ab[0]["n_pair"] == 3  # bot basket excluded
    assert all(not r["item_a"].startswith("x") for r in capped)
    # capped-corpus consistency: supports and the basket count describe
    # the corpus WITHOUT the dropped basket (3 organic baskets), so
    # lift = 3 * 3 / (3 * 3) = 1.0 — not 3 * 3 / (4 * 4) from mixing a
    # capped numerator with uncapped denominators
    assert ab[0]["n_a"] == 3 and ab[0]["n_b"] == 3
    assert ab[0]["lift"] == pytest.approx(1.0)

    uncapped = frequent_pairs(
        df, "bk", "it", min_support=1, top_k=2000, max_basket_size=None
    ).collect()
    ab_u = [r for r in uncapped if (r["item_a"], r["item_b"]) == ("a", "b")]
    assert ab_u[0]["n_pair"] == 4  # bot basket counted without the cap

    sim = item_similarity_topk(
        df, "bk", "it", min_count=1, k=3, max_basket_size=10
    ).collect()
    a_row = [r for r in sim if r["item"] == "a" and r["neighbor"] == "b"]
    assert a_row and a_row[0]["n_both"] == 3
    # capped-corpus cosine: 3 / sqrt(3 * 3) = 1.0 (supports recomputed
    # on the capped frame, not the pre-cap 4-basket supports)
    assert a_row[0]["n_item"] == 3 and a_row[0]["n_neighbor"] == 3
    assert a_row[0]["cosine"] == pytest.approx(1.0)
