"""gradient_descent + linkage_matrix (reference mathext.py:5008, 5222):
sufficient-statistics GD against a plain-python replay, linkage merges
against hand-computed examples (scipy is not in the container)."""

from __future__ import annotations

import math

import pytest


def test_gradient_descent_matches_inmemory_replay(spark):
    from gofast_spark.ml import gradient_descent

    zs = [(float(z), 3.0 + 2.0 * z + (z % 3) * 0.1) for z in range(1, 41)]
    df = spark.createDataFrame(zs, ["z", "s"])
    w, hist = gradient_descent(df, "z", "s", alpha=1e-3, n_epochs=200)

    # replay the reference algorithm in plain python
    n = len(zs)
    a00, a01, a11 = float(n), sum(z for z, _ in zs), sum(z * z for z, _ in zs)
    b0 = sum(s for _, s in zs)
    b1 = sum(z * s for z, s in zs)
    w0 = w1 = 0.0
    for _ in range(200):
        g0 = a00 * w0 + a01 * w1 - b0
        g1 = a01 * w0 + a11 * w1 - b1
        w0, w1 = w0 - 1e-3 * g0 / n, w1 - 1e-3 * g1 / n
    assert w[0] == pytest.approx(w0, rel=1e-9)
    assert w[1] == pytest.approx(w1, rel=1e-9)
    assert len(hist) == 200
    assert hist[-1] <= hist[0]  # descent actually descends


def test_gradient_descent_poly_degree(spark):
    from gofast_spark.ml import gradient_descent

    df = spark.createDataFrame(
        [(float(z), float(z * z)) for z in range(1, 20)], ["z", "s"]
    )
    w, _ = gradient_descent(df, "z", "s", kind="poly", degree=2,
                            alpha=1e-6, n_epochs=50)
    assert len(w) == 3  # intercept + z + z^2


def test_linkage_complete_hand_example(spark):
    from gofast_spark.ml import linkage_matrix

    # 1-D points 0, 1, 10: merge (0,1) at d=1, then complete-linkage
    # distance to the new cluster is max(10, 9) = 10
    df = spark.createDataFrame([(0.0,), (1.0,), (10.0,)], ["x"])
    merges = linkage_matrix(df, ["x"], method="complete")
    dists = sorted(round(d, 6) for _, _, d, _ in merges)
    assert dists == [1.0, 10.0]
    sizes = [s for _, _, _, s in merges]
    assert sorted(sizes) == [2, 3]


def test_linkage_single_vs_complete(spark):
    from gofast_spark.ml import linkage_matrix

    df = spark.createDataFrame([(0.0,), (1.0,), (10.0,)], ["x"])
    single = linkage_matrix(df, ["x"], method="single")
    # single linkage: min(10, 9) = 9 for the second merge
    assert sorted(round(d, 6) for _, _, d, _ in single) == [1.0, 9.0]
    avg = linkage_matrix(df, ["x"], method="average")
    assert sorted(round(d, 6) for _, _, d, _ in avg) == [1.0, 9.5]


def test_linkage_scipy_encoding(spark):
    from gofast_spark.ml import linkage_matrix

    df = spark.createDataFrame(
        [(0.0,), (0.5,), (5.0,), (5.5,)], ["x"]
    )
    merges = linkage_matrix(df, ["x"], method="complete")
    assert len(merges) == 3
    # the final merge joins the two size-2 clusters (ids m+0=4 and m+1=5)
    a, b, d, s = merges[-1]
    assert {a, b} == {4, 5} and s == 4
    assert d == pytest.approx(5.5)


def test_linkage_order_by_controls_leaf_numbering(spark):
    """order_by= pins leaf ids to the natural-key rank (the contract the
    linkage_matrix_nation oracle replays with row_number()): point with
    the smallest key becomes leaf 0 regardless of input row order."""
    from gofast_spark.ml import linkage_matrix

    df = spark.createDataFrame(
        [(30, 10.0), (10, 0.0), (20, 1.0)], ["k", "x"]
    )
    merges = linkage_matrix(
        df, ["x"], method="complete", order_by=["k"]
    )
    # leaves by k-order: 0 -> x=0.0, 1 -> x=1.0, 2 -> x=10.0;
    # first merge is (0, 1) at d=1
    a, b, d, s = merges[0]
    assert (a, b, round(d, 6), s) == (0, 1, 1.0, 2)
    # ... and with the reversed key order, x=10.0 is leaf 0 so the
    # first merge pairs leaves 1 and 2
    df2 = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, 1.0)], ["k", "x"]
    )
    merges2 = linkage_matrix(df2, ["x"], method="complete", order_by=["k"])
    a2, b2, d2, s2 = merges2[0]
    assert (a2, b2, round(d2, 6), s2) == (1, 2, 1.0, 2)
