"""operators/maintenance.py + first-touch funnel invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_compact_files_by_target_rows(spark, tmp_path):
    from gofast_spark.operators.maintenance import compact_files

    src = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    spark.range(1000).repartition(20).write.parquet(src)
    stats = compact_files(
        spark, src, out, target_rows_per_file=400
    ).collect()[0]
    assert stats["files_before"] == 20
    assert stats["files_after"] == 3  # ceil(1000 / 400)
    assert stats["n_rows"] == 1000
    back = spark.read.parquet(out)
    assert back.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_compact_files_requires_sizing(spark, tmp_path):
    from gofast_spark.operators.maintenance import compact_files

    src = str(tmp_path / "s")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="target_files"):
        compact_files(spark, src, str(tmp_path / "o"))


def test_table_checksum_order_and_partition_independent(spark):
    from gofast_spark.operators.maintenance import table_checksum

    df = spark.createDataFrame(
        [Row(k=i, s=f"v{i}") for i in range(100)]
    )
    cols = [F.col("k"), F.col("s")]
    a = table_checksum(df, cols).collect()[0]
    b = table_checksum(df.repartition(7).orderBy(F.col("k").desc()), cols
                       ).collect()[0]
    assert (a["n_rows"], a["checksum"]) == (b["n_rows"], b["checksum"])
    # any single-row change must flip the checksum
    c = table_checksum(
        df.withColumn("s", F.when(F.col("k") == 50, "X").otherwise(F.col("s"))),
        cols,
    ).collect()[0]
    assert c["checksum"] != a["checksum"]


def test_key_skew_report_values(spark):
    from gofast_spark.operators.maintenance import key_skew_report

    rows = [Row(k="hot")] * 90 + [Row(k="a")] * 5 + [Row(k="b")] * 5
    out = key_skew_report(spark.createDataFrame(rows), "k", top_k=2).collect()
    assert out[0]["key"] == "hot" and out[0]["cnt"] == 90
    assert out[0]["share_ppm"] == 900_000
    # mean count per key = 100/3; skew = 90 / (100/3) = 2.7
    assert out[0]["skew_factor"] == pytest.approx(2.7)
    assert out[1]["key"] == "a"  # deterministic tie-break on key


def test_first_touch_vs_sequential_semantics(spark):
    """A user who clicked before their first view and again after: both
    definitions count them; one who ONLY clicked before the first view
    counts sequentially-never but first-touch-never too (t_click < t_view
    fails the ordering) — the divergent case is click-before AND
    no-click-after, counted by neither, vs sequential funnel which needs
    a click AFTER the first view."""
    from gofast_spark.operators.funnel import (
        first_touch_counts,
        first_touch_mins,
        funnel,
    )

    rows = [
        # u1: click at t1, view at t2, click at t3 -> sequential: yes;
        # first-touch: t_click(min)=t1 < t_view=t2 -> no
        Row(u=1, ts="2024-01-01 00:01:00", ty="click"),
        Row(u=1, ts="2024-01-01 00:02:00", ty="view"),
        Row(u=1, ts="2024-01-01 00:03:00", ty="click"),
        # u2: view then click -> both yes
        Row(u=2, ts="2024-01-01 00:01:00", ty="view"),
        Row(u=2, ts="2024-01-01 00:02:00", ty="click"),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    seq = {r["step"]: r["n_users"]
           for r in funnel(df, "u", "ts", "ty", ["view", "click"]).collect()}
    ft = {r["step"]: r["n_users"]
          for r in first_touch_counts(
              first_touch_mins(df, "u", "ts", "ty", ["view", "click"]),
              ["view", "click"]).collect()}
    assert seq["click"] == 2      # sequential counts u1 and u2
    assert ft["click"] == 1       # first-touch counts only u2
    assert seq["view"] == ft["view"] == 2


def test_first_touch_mins_is_batch_invariant(spark):
    """min-per-(user, step) state must be independent of how the data is
    split into batches — union of per-batch states re-aggregated equals
    the one-shot state (the property that makes it streaming-exact)."""
    from gofast_spark.operators.funnel import first_touch_mins

    rows = [Row(u=i % 7, ts=f"2024-01-0{1 + i % 9} 00:0{i % 6}:00",
                ty=["view", "click", "purchase"][i % 3])
            for i in range(60)]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    steps = ["view", "click", "purchase"]
    whole = first_touch_mins(df, "u", "ts", "ty", steps)
    b1 = first_touch_mins(df.limit(30), "u", "ts", "ty", steps)
    b2 = first_touch_mins(df.subtract(df.limit(30)), "u", "ts", "ty", steps)
    merged = (
        b1.unionByName(b2)
        .groupBy("user")
        .agg(*[F.min(f"t{i}").alias(f"t{i}") for i in range(3)])
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_target_encode_shrinks_rare_categories(spark):
    from gofast_spark.ml.encoding import target_encode

    rows = [("a", 10.0)] * 50 + [("b", 100.0)] * 2
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r["cat"]: r["cat_te"]
           for r in target_encode(df, "cat", "y", alpha=10.0)
           .select("cat", "cat_te").distinct().collect()}
    gm = (50 * 10.0 + 2 * 100.0) / 52
    assert out["a"] == pytest.approx((500 + 10 * gm) / 60)
    assert out["b"] == pytest.approx((200 + 10 * gm) / 12)
    # rare category sits much closer to the prior than its raw mean
    assert abs(out["b"] - gm) < abs(100.0 - gm) / 2


def test_woe_encode_signs_and_null_fallback(spark):
    from gofast_spark.ml.encoding import woe_encode

    rows = [("good_seg", 1)] * 30 + [("good_seg", 0)] * 10 \
        + [("bad_seg", 1)] * 10 + [("bad_seg", 0)] * 30 \
        + [("unlabeled_seg", None)]
    df = spark.createDataFrame(rows, "cat string, y int")
    out = woe_encode(df, "cat", "y").select("cat", "cat_woe").distinct()
    got = {r["cat"]: r["cat_woe"] for r in out.collect()}
    assert got["good_seg"] > 0 > got["bad_seg"]
    # mirror-image class balance -> antisymmetric WOE
    assert got["good_seg"] == pytest.approx(-got["bad_seg"], rel=1e-9)
    # a category with no labeled rows carries no evidence
    assert got["unlabeled_seg"] == 0.0


def test_psi_zero_for_identical_and_positive_for_shifted(spark):
    from gofast_spark.quality.drift import psi_report

    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    same = psi_report(a, a, "x", lo=0.0, hi=100.0, bins=10).first()
    assert same["psi"] == pytest.approx(0.0, abs=1e-12)
    b = a.select((F.col("x") + 50.0).alias("x"))
    shifted = psi_report(a, b, "x", lo=0.0, hi=100.0, bins=10).first()
    assert shifted["psi"] > 0.25  # folklore "shifted" threshold
    assert shifted["n_ref"] == shifted["n_cur"] == 1000
