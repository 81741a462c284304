"""JL random-sign projection (sim/projection.py)."""

from __future__ import annotations

import math
import random

import pytest


def test_matrix_deterministic_and_signed():
    from gofast_spark.sim.projection import jl_sign_matrix

    a = jl_sign_matrix(8, 4, seed=1)
    b = jl_sign_matrix(8, 4, seed=1)
    c = jl_sign_matrix(8, 4, seed=2)
    assert a == b
    assert a != c
    assert all(s in (-1, 1) for row in a for s in row)


def test_projection_matches_python(spark):
    from gofast_spark.sim.projection import jl_project, jl_sign_matrix

    rng = random.Random(5)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(12)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id int, v array<double>")
    out = {
        r["vec_id"]: r["jl_vec"]
        for r in jl_project(
            df, "v", in_dim=12, out_dim=6, seed=9
        ).collect()
    }
    r = jl_sign_matrix(12, 6, seed=9)
    scale = 1.0 / math.sqrt(6)
    for vid, v in vecs:
        want = [scale * sum(x * s for x, s in zip(v, r[j])) for j in range(6)]
        assert out[vid] == pytest.approx(want, abs=1e-9)


def test_distance_preservation_in_expectation(spark):
    from gofast_spark.sim.projection import jl_project

    rng = random.Random(11)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id int, v array<double>")
    proj = {
        r["vec_id"]: r["jl_vec"]
        for r in jl_project(
            df, "v", in_dim=64, out_dim=16, seed=0
        ).collect()
    }
    orig = dict(vecs)

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ratios = []
    ids = sorted(orig)
    for i in range(0, 28, 2):
        a, b = ids[i], ids[i + 1]
        ratios.append(d2(proj[a], proj[b]) / d2(orig[a], orig[b]))
    mean = sum(ratios) / len(ratios)
    # E[ratio] = 1; with 16 dims the per-pair variance is ~1/8, so the
    # 14-pair mean concentrates well inside [0.6, 1.4]
    assert 0.6 < mean < 1.4, mean


def test_projection_plan_is_shuffle_free(spark):
    from gofast_spark.sim.projection import jl_project

    df = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id int, v array<double>"
    )
    plan = (
        jl_project(df, "v", in_dim=8, out_dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_shortlist_recall_on_planted_neighbors(spark):
    """On data with REAL structure (planted near-copies), the JL
    shortlist recovers the true cosine top-k; on isotropic random
    vectors neighbor gaps are below JL distortion by design, so that
    is not the right recall testbed."""
    import random

    from pyspark.sql import functions as F

    from gofast_spark.sim import cosine_topk
    from gofast_spark.sim.projection import jl_shortlist_topk

    rng = random.Random(3)
    rows = []
    for qi in range(5):
        base = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((qi, base))
        for c in range(5):  # 5 near-copies per query
            rows.append(
                (100 + qi * 10 + c,
                 [x + rng.gauss(0, 0.15) for x in base])
            )
    rows += [(1000 + i, [rng.gauss(0, 1) for _ in range(64)])
             for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, q, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in jl_shortlist_topk(
            df, q, "vec_id", "embedding",
            in_dim=64, out_dim=16, shortlist=20, k=5, seed=3,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
