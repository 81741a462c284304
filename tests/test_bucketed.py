"""Bucketed tables: the co-located-join contract (sources/bucketed.py).

The point of bucketing is plan shape, so that's what's asserted: a join
of two tables bucketed on the same key with the same bucket count must
contain NO Exchange — the shuffle was paid at write time."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gofast_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", "k", num_buckets=4, sort_cols="k")
    write_bucketed(b, "bkt_b", "k", num_buckets=4, sort_cols="k")
    yield "bkt_a", "bkt_b"
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    # disable the broadcast fast-path (these test tables are tiny, and a
    # broadcast would hide the property under test): at scale the
    # planner picks SortMergeJoin, and bucketing must remove BOTH
    # hash-partitioning exchanges
    ta, tb = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ta).join(read_table(spark, tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_round_trip_values(spark, bucketed_pair):
    ta, _ = bucketed_pair
    got = read_table(spark, ta).agg(
        F.count(F.lit(1)).alias("n"), F.sum("va").alias("s")
    ).collect()[0]
    assert got["n"] == 10_000
    assert got["s"] == sum(2 * i for i in range(10_000))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_table(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
