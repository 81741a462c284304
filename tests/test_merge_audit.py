"""merge_upsert semantics + plan-audit utility tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gofast_spark.operators.merge_upsert import (
    merge_upsert,
    source_col,
    target_col,
)
from gofast_spark.plans.audit import audit_plan, audit_report


@pytest.fixture()
def tables(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )
    source = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], ["k", "name", "v"]
    )
    return target, source


def test_merge_updates_and_inserts(spark, tables):
    target, source = tables
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, source, "k").collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_merge_is_idempotent(spark, tables):
    target, source = tables
    once = merge_upsert(target, source, "k")
    twice = merge_upsert(once, source, "k")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_merge_delete_condition(spark, tables):
    target, source = tables
    out = merge_upsert(
        target, source, "k", delete_condition=source_col("v") > 50
    )
    assert sorted(r.k for r in out.collect()) == [1, 3, 4]  # k=2 deleted


def test_merge_conditional_update_version_gate(spark):
    target = spark.createDataFrame([(1, 5, "old")], ["k", "ver", "val"])
    stale = spark.createDataFrame([(1, 3, "stale")], ["k", "ver", "val"])
    fresh = spark.createDataFrame([(1, 7, "new")], ["k", "ver", "val"])
    gate = source_col("ver") > target_col("ver")
    a = merge_upsert(target, stale, "k", update_condition=gate).collect()[0]
    b = merge_upsert(target, fresh, "k", update_condition=gate).collect()[0]
    assert (a.ver, a.val) == (5, "old")
    assert (b.ver, b.val) == (7, "new")


def test_merge_rejects_duplicate_source_keys(spark, tables):
    target, _ = tables
    dup = spark.createDataFrame(
        [(2, "x", 1), (2, "y", 2)], ["k", "name", "v"]
    )
    with pytest.raises(ValueError, match="ambiguous merge"):
        merge_upsert(target, dup, "k")


def test_merge_rejects_missing_columns(spark, tables):
    target, _ = tables
    with pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(target, target.select("k", "name"), "k")


def test_merge_null_keys_match_null_safely(spark):
    target = spark.createDataFrame([(None, 1)], "k int, v int")
    source = spark.createDataFrame([(None, 2)], "k int, v int")
    out = merge_upsert(target, source, "k").collect()
    assert len(out) == 1 and out[0].v == 2  # null key matched, updated


# ------------------------------------------------------------ plan audit


def test_audit_counts_broadcast_join(spark, sf_small):
    from gofast_spark.plans.catalog import QUERIES

    a = audit_plan(
        QUERIES["flagship_revenue_by_region"](spark, sf_small), execute=True
    )
    assert a["broadcast_hash_joins"] >= 1
    assert a["cartesian_joins"] == 0
    assert a["codegen_stages"] >= 1


def test_audit_flags_cartesian(spark):
    l = spark.range(10)
    r = spark.range(10).withColumnRenamed("id", "id2")
    a = audit_plan(l.crossJoin(r))
    assert a["cartesian_joins"] + a["nested_loop_joins"] >= 1
    assert "WARNING" in audit_report(l.crossJoin(r)) or a["cartesian_joins"] == 0


def test_audit_sees_pushed_filters_and_columns(spark, sf_small):
    df = (
        spark.read.parquet(f"{sf_small}/lineitem.parquet")
        .where(F.col("l_quantity") > 10)
        .select("l_orderkey", "l_quantity")
    )
    a = audit_plan(df)
    assert a["scans_with_pushed_filters"] == 1
    assert set(a["read_columns"]) <= {"l_orderkey", "l_quantity"}


def test_suggest_shuffle_partitions_scales_with_size(spark):
    from gofast_spark.plans.audit import suggest_shuffle_partitions

    small = spark.range(100)
    big = spark.range(100).withColumn("pad", F.lit("x" * 2000))
    a = suggest_shuffle_partitions(small, target_mb=1)
    b = suggest_shuffle_partitions(big, target_mb=1)
    assert a >= 1 and b >= a


def test_suggest_shuffle_partitions_empty(spark):
    from gofast_spark.plans.audit import suggest_shuffle_partitions

    assert suggest_shuffle_partitions(spark.range(0), target_mb=64) == 1


def test_table_diff_change_classification(spark):
    from pyspark.sql import Row

    from gofast_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a", x=1), Row(k=2, v="b", x=2), Row(k=3, v=None, x=3)]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="a", x=1),        # unchanged -> not emitted
         Row(k=2, v="B", x=2),        # update
         Row(k=4, v="d", x=4)],       # insert; k=3 deleted
    )
    out = {r["k"]: r for r in table_diff(old, new, "k").collect()}
    assert set(out) == {2, 3, 4}
    assert out[2]["change"] == "update" and out[2]["v_new"] == "B"
    assert out[3]["change"] == "delete" and out[3]["v_new"] is None
    assert out[4]["change"] == "insert" and out[4]["v_old"] is None
    # null-safe compare: NULL -> NULL is unchanged
    new2 = spark.createDataFrame(
        [(3, None, 3)], "k bigint, v string, x bigint"
    )
    only3 = table_diff(
        old.where("k = 3"), new2, "k"
    ).collect()
    assert only3 == []
