"""association_rules vs brute-force basket counting."""

from __future__ import annotations

from itertools import combinations


def test_association_rules_brute_force(spark):
    from gofast_spark.ml.itemsets import association_rules

    baskets = {
        1: {"a", "b", "c"},
        2: {"a", "b"},
        3: {"a", "b", "d"},
        4: {"b", "c"},
        5: {"a", "c"},
        6: {"a", "b", "c"},
        7: {"b", "c", "d"},
        8: {"a", "b"},
    }
    rows = [(bk, it) for bk, items in baskets.items() for it in items]
    df = spark.createDataFrame(rows, ["bk", "it"])
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(
            df, "bk", "it", min_support=2, top_pairs=50
        ).collect()
    }
    # brute force
    supp = {}
    for items in baskets.values():
        for it in items:
            supp[it] = supp.get(it, 0) + 1
        for a, b in combinations(sorted(items), 2):
            supp[(a, b)] = supp.get((a, b), 0) + 1
    nb = len(baskets)
    for (a, b), np_ in [(k, v) for k, v in supp.items() if isinstance(k, tuple)]:
        if np_ < 2 or supp[a] < 2 or supp[b] < 2:
            continue
        for ant, cons in ((a, b), (b, a)):
            r = got[(ant, cons)]
            assert r["n_pair"] == np_
            assert abs(r["support"] - np_ / nb) < 1e-12
            assert abs(r["confidence"] - np_ / supp[ant]) < 1e-12
            assert abs(r["lift"] - nb * np_ / (supp[a] * supp[b])) < 1e-12
    # ordering: confidence non-increasing
    confs = [
        r["confidence"]
        for r in association_rules(
            df, "bk", "it", min_support=2, top_pairs=50
        ).collect()
    ]
    assert confs == sorted(confs, reverse=True)
