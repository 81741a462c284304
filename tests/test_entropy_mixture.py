"""char_entropy_frame + temperature_mixture_rates semantics, and a
dynamic-partition-pruning plan check for partitioned fact tables."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_char_entropy_known_values(spark):
    from gofast_spark.text.entropy import char_entropy_frame

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # one symbol -> 0 bits
            (2, "abab"),          # two equiprobable symbols -> 1 bit
            (3, ""),              # empty -> 0 by contract
            (4, "abcd"),          # four equiprobable -> 2 bits
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["entropy"])
        for r in char_entropy_frame(df, "text", id_cols=["doc_id"]).collect()
    }
    assert got[1] == (4, pytest.approx(0.0, abs=1e-6))
    assert got[2] == (4, pytest.approx(1.0, abs=1e-6))
    assert got[3][0] == 0 and got[3][1] == 0.0
    assert got[4] == (4, pytest.approx(2.0, abs=1e-6))


def test_char_entropy_matches_python(spark):
    from gofast_spark.text.entropy import char_entropy_frame

    texts = ["the quick brown fox", "aaa bbb aaa bbb", "x"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: r["entropy"]
        for r in char_entropy_frame(df, "text", id_cols=["doc_id"]).collect()
    }
    for i, t in enumerate(texts):
        counts: dict[str, int] = {}
        for c in t:
            counts[c] = counts.get(c, 0) + 1
        n = len(t)
        want = -sum((k / n) * math.log2(k / n) for k in counts.values())
        assert got[i] == pytest.approx(want, abs=1e-4), t


def test_temperature_rates_limits(spark):
    from gofast_spark.operators.mixture import temperature_mixture_rates

    df = spark.createDataFrame(
        [("big", i) for i in range(90)] + [("small", i) for i in range(10)],
        ["src", "i"],
    )
    # T=1: natural proportions -> every rate identical (budget/total)
    r1 = {
        r["src"]: r["rate"]
        for r in temperature_mixture_rates(
            df, "src", F.lit(1), temperature=1.0, budget=50.0
        ).collect()
    }
    assert r1["big"] == pytest.approx(r1["small"], rel=1e-12)
    assert r1["big"] == pytest.approx(0.5, rel=1e-12)
    # T=0: uniform over domains -> small source upweighted 9x vs big
    r0 = {
        r["src"]: r["rate"]
        for r in temperature_mixture_rates(
            df, "src", F.lit(1), temperature=0.0, budget=50.0
        ).collect()
    }
    assert r0["small"] / r0["big"] == pytest.approx(9.0, rel=1e-9)
    # target weights always sum to the budget
    tw = temperature_mixture_rates(
        df, "src", F.lit(1), temperature=0.7, budget=50.0
    ).agg(F.sum("target_weight")).collect()[0][0]
    assert tw == pytest.approx(50.0, rel=1e-9)


def test_partitioned_write_enables_dynamic_pruning(spark, tmp_path):
    """Joining a partition-column-filtered dim against a partitioned
    fact must plan a dynamicpruning subquery on the fact scan — the
    mechanism that keeps a 100-TB partitioned table from full-scanning
    when the filter arrives through a join."""
    fact = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("string").alias("part"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "fact_parted")
    fact.write.partitionBy("part").mode("overwrite").parquet(path)
    f = spark.read.parquet(path)
    dim = spark.range(0, 10).select(
        F.col("id").cast("string").alias("part"),
        (F.col("id") % 2 == 0).alias("keep"),
    )
    joined = f.join(dim.where("keep"), "part")
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized.lower()


def test_drop_consecutive_duplicates(spark):
    from gofast_spark.operators.windows import drop_consecutive_duplicates

    rows = [
        ("u1", 1, "a"), ("u1", 2, "a"), ("u1", 3, "b"), ("u1", 4, "b"),
        ("u1", 5, "a"), ("u2", 1, None), ("u2", 2, None), ("u2", 3, "x"),
    ]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    kept = sorted(
        (r["k"], r["o"])
        for r in drop_consecutive_duplicates(
            df, ["k"], "o", ["v"]
        ).collect()
    )
    # change points only; first row per key always survives (even NULL),
    # NULL->NULL runs collapse
    assert kept == [("u1", 1), ("u1", 3), ("u1", 5), ("u2", 1), ("u2", 3)]


def test_robust_scale_semantics(spark):
    from gofast_spark.quality.scaling import robust_scale

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 100])],
        ["i", "v"],
    )
    out = {r["i"]: r["v_s"] for r in robust_scale(df, ["v"], suffix="_s").collect()}
    # median 3, q1 2, q3 4 -> iqr 2; the outlier barely moves the stats
    assert out[2] == 0.0
    assert out[0] == -1.0 and out[3] == 0.5
    assert out[4] == 48.5
    # constant column: iqr 0 -> divide by 1, center at median
    cdf = spark.createDataFrame([(1, 5.0), (2, 5.0)], ["i", "v"])
    vals = {r["i"]: r["v_s"] for r in robust_scale(cdf, ["v"], suffix="_s").collect()}
    assert vals == {1: 0.0, 2: 0.0}


def test_blocked_levenshtein_pairs(spark):
    from gofast_spark.operators.linkage import blocked_levenshtein_pairs

    rows = [
        (1, "John Smith"), (2, "Jon Smith"), (3, "John Smyth"),
        (4, "Jane Doe"), (5, "Jane Doe"), (6, "Completely Other"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    # block on the FIRST token only so john/jon land in different
    # blocks (blocking recall is the caller's tradeoff — assert it)
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in blocked_levenshtein_pairs(
            df, "id", "name", block_tokens=1, max_dist=2
        ).collect()
    }
    assert got[(1, 3)] == 1          # john smith ~ john smyth
    assert got[(4, 5)] == 0          # exact dup
    assert (1, 2) not in got         # different block: blocking miss
    assert all(a < b for a, b in got)
    plan = (
        blocked_levenshtein_pairs(df, "id", "name", block_tokens=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_robust_scale_grouped_per_segment(spark):
    from gofast_spark.quality.scaling import robust_scale_grouped

    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)]
    rows += [("b", float(v)) for v in (10, 20, 30, 40, 50)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = robust_scale_grouped(df, ["v"], ["g"], suffix="_s").collect()
    by = {}
    for r in out:
        by.setdefault(r["g"], []).append(r["v_s"])
    # both segments normalize to the same shape despite 10x scale
    assert sorted(by["a"]) == sorted(by["b"])
    assert sorted(by["a"]) == [-1.0, -0.5, 0.0, 0.5, 1.0]


def test_mann_whitney_small_example(spark):
    """Hand-computed example with ties: a=[1,2,2,5], b=[2,3,4]."""
    import math

    from gofast_spark.stats.inferential import mann_whitney_u

    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
            ("b", 2.0), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
    # ranks: 1->1; the three 2s -> midrank 3; 3->5; 4->6; 5->7
    # R_a = 1 + 3 + 3 + 7 = 14; U_a = 14 - 4*5/2 = 4; U_b = 4*3 - 4 = 8
    assert r["u_a"] == 4.0 and r["u_b"] == 8.0
    assert r["n_a"] == 4 and r["n_b"] == 3
    # tie term: one group of 3 -> 3^3-3 = 24; var = 12/12*(8 - 24/42)
    var = 4 * 3 / 12.0 * (8 - 24 / (7 * 6))
    want_z = (4 - 6) / math.sqrt(var)
    assert r["z"] == pytest.approx(want_z, rel=1e-12)


def test_cohens_d_known_value(spark):
    from gofast_spark.stats.inferential import cohens_d

    rows = [("a", v) for v in (2.0, 4.0, 6.0)] + [
        ("b", v) for v in (1.0, 2.0, 3.0)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = cohens_d(df, "v", "g", "a", "b").collect()[0]
    # means 4 and 2; ss_a = 8, ss_b = 2 -> pooled sd = sqrt(10/4)
    import math
    assert r["mean_a"] == 4.0 and r["mean_b"] == 2.0
    assert r["pooled_sd"] == pytest.approx(math.sqrt(2.5), rel=1e-12)
    assert r["d"] == pytest.approx(2.0 / math.sqrt(2.5), rel=1e-12)
