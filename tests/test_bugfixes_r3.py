"""Regression tests for the round-2 review findings (VERDICT/ADVICE r2):
savgol even-length clamp, Kaplan-Meier d==n absorption, per-column noise
seeds, dual_merge nearest-mode column suffixing, gini midranks on ties,
minhash shingle-cache eviction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_savgol_even_short_group(spark):
    """ADVICE r2: an even-length group shorter than window_length used to
    clamp the window UP to len+1 and crash scipy in 'interp' mode."""
    pytest.importorskip("scipy")
    from gofast_spark.ts.decompose import savgol_smooth

    rows = [("a", f"t{i}", float(i)) for i in range(4)]  # len 4 < default 7
    df = spark.createDataFrame(rows, ["s", "t", "v"])
    out = savgol_smooth(df, "s", "t", "v").collect()
    assert len(out) == 4
    assert all(r["v_sg"] is not None for r in out)


def test_kaplan_meier_all_fail_at_last_time(spark):
    """ADVICE r2: when n_events == n_risk at a duration, survival must
    drop to 0 from that time onward (log(0) is NULL in Spark and was
    silently skipped by the cumulative sum)."""
    from gofast_spark.stats.survival import kaplan_meier

    # 3 subjects: one fails at t=1, the remaining two both fail at t=2
    df = spark.createDataFrame([(1, 1), (2, 1), (2, 1)], ["d", "e"])
    got = {r["duration"]: r["survival"] for r in kaplan_meier(df, "d", "e").collect()}
    assert got[1] == pytest.approx(2 / 3)
    assert got[2] == 0.0


def test_augment_noise_independent_per_column(spark):
    """ADVICE r2: augment_data/replace_data reused one randn seed for all
    noise columns, giving perfectly correlated jitter."""
    from gofast_spark.quality.augment import replace_data

    df = spark.createDataFrame([(float(i), float(i)) for i in range(200)], ["a", "b"])
    out = replace_data(df, 1, noise_std=1.0, noise_cols=["a", "b"])
    diff = out.select((F.col("a") - F.col("b")).alias("d")).agg(
        F.stddev("d").alias("sd")
    ).collect()[0]["sd"]
    # identical draws would give sd == 0 exactly; independent draws ~ sqrt(2)
    assert diff > 0.5


def test_dual_merge_nearest_suffixes_collisions(spark):
    """ADVICE r2: dual_merge(find_closest=True) returned duplicate column
    names when both sides carry the same feature columns."""
    from gofast_spark.operators import dual_merge

    left = spark.createDataFrame(
        [(1, 10.0, 20.0)], ["id", "longitude", "latitude"]
    )
    right = spark.createDataFrame(
        [(9, 10.001, 20.001)], ["rid", "longitude", "latitude"]
    )
    out = dual_merge(
        left, right, ("longitude", "latitude"),
        find_closest=True, threshold=0.01, left_key="id",
    )
    assert len(out.columns) == len(set(out.columns))
    assert "longitude_right" in out.columns and "latitude_right" in out.columns
    # downstream select on the shared name must not be ambiguous
    assert out.select("longitude").collect()[0][0] == 10.0


def test_gini_score_midranks_on_ties(spark):
    """ADVICE r2: tied scores must get midranks (sklearn AUC), not
    arbitrary row_number order.  All-tied scores carry no information:
    AUC must be exactly 0.5 -> gini 0."""
    from gofast_spark.metrics import gini_score

    df = spark.createDataFrame(
        [(1, 5.0), (0, 5.0), (1, 5.0), (0, 5.0)], ["y", "s"]
    )
    g = gini_score(df, "y", "s").collect()[0]["gini_score"]
    assert g == pytest.approx(0.0)

    # half-tied case cross-checked against sklearn's roc_auc_score value:
    # y=[1,1,0,0], s=[2,1,1,0] -> AUC = 0.875 -> gini = 0.75
    df2 = spark.createDataFrame(
        [(1, 2.0), (1, 1.0), (0, 1.0), (0, 0.0)], ["y", "s"]
    )
    g2 = gini_score(df2, "y", "s").collect()[0]["gini_score"]
    assert g2 == pytest.approx(0.75)


def test_near_dup_pairs_releases_shingle_cache(spark):
    """ADVICE r2: near_dup_pairs persisted the shingle frame and never
    unpersisted it; eager mode must leave at most the (small) result's
    localCheckpoint RDD in the registry — that one holds no CacheManager
    entry and is freed by the ContextCleaner once the returned frame is
    garbage-collected, so there is no caller-side unpersist obligation."""
    from gofast_spark.dedup.minhash import near_dup_pairs

    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different text with no overlap at all")],
        ["doc_id", "text"],
    )
    out = near_dup_pairs(df, "doc_id", "text", threshold=0.2)
    assert out.count() >= 1  # usable after the shingle cache is gone
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    # the shingle-set frame's persist must be gone; at most the two
    # localCheckpoint RDDs stay (candidates + result — neither holds a
    # CacheManager entry; the ContextCleaner frees them on GC, so there
    # is still no caller-side unpersist obligation)
    assert len(after - before) <= 2
