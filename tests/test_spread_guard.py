"""Library-safety spread guard (dedup/minhash.spread_small_scan):
single-part bare local scans are spread before the compute-heavy
shingle/token projections, already-spread and derived inputs pass
through unchanged, and results are identical either way (VERDICT r15
item 8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gofast_spark.dedup.minhash import doc_shingle_sets, spread_small_scan
from gofast_spark.dedup.simhash import simhash


@pytest.fixture(scope="module")
def one_part_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("spread") / "docs.parquet")
    spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon tok{i}") for i in range(50)],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return p


def test_guard_spreads_single_part_scan(spark, one_part_parquet):
    d = spark.read.parquet(one_part_parquet)
    target = spark.sparkContext.defaultParallelism
    out = spread_small_scan(d)
    # the guard added a round-robin repartition to session parallelism
    assert out.rdd.getNumPartitions() == target
    # and the shingle path picks it up end-to-end
    sets = doc_shingle_sets(d, "doc_id", "text")
    assert sets.rdd.getNumPartitions() == target


def test_guard_passes_through_prespread_input(spark, one_part_parquet):
    d = spark.read.parquet(one_part_parquet).repartition(5)
    out = spread_small_scan(d)
    # a caller-owned repartition is respected — no stacked exchange
    assert out is d


def test_guard_passes_through_derived_plans(spark):
    d = spark.createDataFrame(
        [(1, "a b c")], "doc_id bigint, text string"
    )
    # no file scan underneath -> inputFiles() is empty -> untouched
    assert spread_small_scan(d) is d


def test_guard_assume_spread_skips(spark, one_part_parquet):
    d = spark.read.parquet(one_part_parquet)
    assert spread_small_scan(d, assume_spread=True) is d


def test_results_identical_with_and_without_guard(spark, one_part_parquet):
    d = spark.read.parquet(one_part_parquet)
    a = sorted(
        doc_shingle_sets(d, "doc_id", "text")
        .select("doc_id", F.sort_array("sh_set").alias("s"))
        .collect()
    )
    b = sorted(
        doc_shingle_sets(d.repartition(8), "doc_id", "text")
        .select("doc_id", F.sort_array("sh_set").alias("s"))
        .collect()
    )
    assert [(r["doc_id"], r["s"]) for r in a] == [
        (r["doc_id"], r["s"]) for r in b
    ]
    sa = sorted(map(tuple, simhash(d, "doc_id", "text").collect()))
    sb = sorted(map(tuple, simhash(d.repartition(8), "doc_id", "text").collect()))
    assert sa == sb
