"""Unit tests: common-neighbor link prediction (ml/graph.py)."""

from __future__ import annotations

import math

import pytest


def test_link_prediction_path_graph(spark):
    from gofast_spark.ml.graph import link_prediction

    # path 1-2-3-4: non-edges with common neighbors: (1,3) via 2, (2,4) via 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rows = {(r["u"], r["v"]): r for r in link_prediction(edges).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    r13 = rows[(1, 3)]
    assert r13["common"] == 1
    # N(1)={2}, N(3)={2,4} -> union 2
    assert r13["union_deg"] == 2
    assert r13["jaccard"] == pytest.approx(0.5)
    # middle is node 2 with degree 2
    assert r13["adamic_adar"] == pytest.approx(1 / math.log(2))


def test_link_prediction_excludes_existing_edges(spark):
    from gofast_spark.ml.graph import link_prediction

    # triangle + pendant: (1,2),(2,3),(1,3),(3,4)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {(r["u"], r["v"]) for r in link_prediction(edges).collect()}
    # (1,2),(2,3),(1,3) are edges -> excluded even though they share
    # neighbors; candidates are (1,4) and (2,4) via middle 3
    assert got == {(1, 4), (2, 4)}


def test_link_prediction_brute_force(spark):
    from gofast_spark.ml.graph import link_prediction

    import itertools
    import random

    rng = random.Random(6)
    nodes = list(range(15))
    edge_set = set()
    for _ in range(30):
        u, v = rng.sample(nodes, 2)
        edge_set.add((min(u, v), max(u, v)))
    edges = spark.createDataFrame(
        sorted(edge_set), "src long, dst long"
    )
    got = {
        (r["u"], r["v"]): (r["common"], r["union_deg"])
        for r in link_prediction(edges, top_k=1000).collect()
    }
    adj = {n: set() for n in nodes}
    for u, v in edge_set:
        adj[u].add(v)
        adj[v].add(u)
    expect = {}
    for u, v in itertools.combinations(nodes, 2):
        if (u, v) in edge_set:
            continue
        c = len(adj[u] & adj[v])
        if c:
            expect[(u, v)] = (c, len(adj[u]) + len(adj[v]) - c)
    assert got == expect
