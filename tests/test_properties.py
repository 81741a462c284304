"""Property-based tests (hypothesis) — randomized invariants the example
tests can't cover (SURVEY §5.1 notes the reference has none; these are
net-new rigor)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(keys=st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_hash_bucket_always_in_range(spark, keys):
    from pyspark.sql import functions as F

    from gofast_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    out = df.select(hash_bucket(F.col("k"), buckets=7).alias("b")).collect()
    assert all(0 <= r["b"] < 7 for r in out)


@given(
    left=st.lists(floats, min_size=1, max_size=12),
    right=st.lists(floats, min_size=1, max_size=12),
)
@settings(**SETTINGS)
def test_nearest_join_matches_bruteforce(spark, left, right):
    from gofast_spark.operators import nearest_join

    ldf = spark.createDataFrame([(i, v) for i, v in enumerate(left)], ["lid", "x"])
    rdf = spark.createDataFrame([(i, v) for i, v in enumerate(right)], ["rid", "y"])
    got = {
        r["lid"]: r["rid"]
        for r in nearest_join(
            ldf, rdf, "x", "y", threshold=10.0, tiebreak="rid", left_key="lid"
        ).collect()
    }
    # brute-force expectation
    for i, x in enumerate(left):
        cands = [
            (abs(x - y), j) for j, y in enumerate(right) if abs(x - y) <= 10.0
        ]
        if not cands:
            assert i not in got
        else:
            assert got[i] == min(cands)[1]


@given(vals=st.lists(floats, min_size=2, max_size=30, unique=True))
@settings(**SETTINGS)
def test_minmax_scale_bounds(spark, vals):
    from gofast_spark.quality import minmax_scale

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = [r["v"] for r in minmax_scale(df, ["v"]).collect()]
    assert all(-1e-9 <= x <= 1 + 1e-9 for x in out)
    assert math.isclose(min(out), 0.0, abs_tol=1e-9)
    assert math.isclose(max(out), 1.0, abs_tol=1e-9)


@given(
    vals=st.lists(
        st.one_of(floats, st.none()), min_size=3, max_size=20
    )
)
@settings(**SETTINGS)
def test_interpolate_matches_pandas(spark, vals):
    import pandas as pd

    from gofast_spark.operators import interpolate_data

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i bigint, v double"
    )
    got = {
        r["i"]: r["v_interp"]
        for r in interpolate_data(df, "v", "i").collect()
    }
    want = pd.Series(vals, dtype=float).interpolate(method="linear")
    for i in range(len(vals)):
        w = want.iloc[i]
        g = got[i]
        if pd.isna(w):
            assert g is None
        else:
            assert g is not None and math.isclose(g, w, rel_tol=1e-9, abs_tol=1e-9)


@given(vals=st.lists(floats.filter(lambda x: abs(x) > 1e-6), min_size=1, max_size=15))
@settings(**SETTINGS)
def test_cumprod_matches_python(spark, vals):
    from gofast_spark.operators import cumulative_ops

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i bigint, v double"
    )
    got = [
        r["v_cumprod"]
        for r in cumulative_ops(df, "v", order_by="i", op="cumprod")
        .orderBy("i")
        .collect()
    ]
    acc = 1.0
    for g, v in zip(got, vals):
        acc *= v
        if acc == 0 or g == 0:
            assert math.isclose(g, acc, abs_tol=1e-12)
        else:
            assert math.isclose(g, acc, rel_tol=1e-6)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """Hash-min propagation must agree with a driver-side union-find on
    arbitrary small graphs (chains, cliques, self-loops, multi-edges)."""
    from gofast_spark.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=18,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_two_phase_cc_matches_union_find(spark, edges):
    from gofast_spark.dedup import connected_components_two_phase

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components_two_phase(df).collect()
    }
    assert got == expected


def test_weighted_sample_proportionality_and_determinism(spark):
    from pyspark.sql import functions as F

    from gofast_spark.operators.sampling import weighted_sample

    # two weight classes, 10x apart: heavy ids should dominate the draw
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(1.0).alias("w"),
    )
    out = weighted_sample(df, "id", "w", k=200, seed=3)
    rows = out.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r["id"] % 2 == 0)
    # E[heavy] ~ 183 for 10:1 weights; allow wide slack
    assert heavy > 140, heavy
    # deterministic under repartitioning
    again = weighted_sample(df.repartition(17), "id", "w", k=200, seed=3)
    assert sorted(r["id"] for r in rows) == sorted(
        r["id"] for r in again.collect()
    )
    # zero/negative/null weights never drawn
    bad = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, None), (4, 2.0)], "id long, w double"
    )
    got = {r["id"] for r in weighted_sample(bad, "id", "w", k=10).collect()}
    assert got == {4}


def test_categorical_association_reference_values(spark):
    """2x2 table with known chi2/V/MI: [[30, 10], [10, 30]]."""
    import math

    from gofast_spark.stats.relationships import categorical_association

    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 30
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = categorical_association(df, "a", "b").collect()[0]
    # chi2 = n*(ad-bc)^2 / (r1*r2*c1*c2) = 80*(900-100)^2/40^4 = 20
    assert abs(r["chi2"] - 20.0) < 1e-9
    assert abs(r["cramers_v"] - math.sqrt(20.0 / 80)) < 1e-9
    mi = sum(
        (nab / 80) * math.log((nab * 80) / (40 * 40))
        for nab in (30, 10, 10, 30)
    )
    assert abs(r["mutual_info"] - mi) < 1e-9
    assert (r["n"], r["r"], r["c"]) == (80, 2, 2)
