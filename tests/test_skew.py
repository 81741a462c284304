"""Salted aggregation/join must be value-identical to the unsalted plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%), many cold keys
    hot = [("hot", float(i % 7)) for i in range(9000)]
    cold = [(f"k{i % 50}", float(i)) for i in range(1000)]
    return spark.createDataFrame(hot + cold, ["k", "v"]).repartition(16).cache()


def test_salted_group_agg_equals_plain(spark, skewed):
    from gofast_spark.operators import salted_group_agg

    got = {
        r["k"]: (r["n"], round(r["v_sum"], 6), round(r["v_avg"], 6), r["v_min"], r["v_max"])
        for r in salted_group_agg(
            skewed, "k",
            [("*", "count"), ("v", "sum"), ("v", "avg"), ("v", "min"), ("v", "max")],
            salt=8,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], round(r["v_sum"], 6), round(r["v_avg"], 6), r["v_min"], r["v_max"])
        for r in skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v_sum"),
            F.avg("v").alias("v_avg"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        ).collect()
    }
    assert got == want


def test_salted_join_equals_plain(spark, skewed):
    from gofast_spark.operators import salted_join

    dim_rows = [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)]
    dim = spark.createDataFrame(dim_rows, ["k", "label"])
    got = salted_join(skewed, dim, "k", salt=4).groupBy("label").count()
    want = skewed.join(dim, "k").groupBy("label").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_group_agg_rejects_nondecomposable(spark, skewed):
    from gofast_spark.operators import salted_group_agg

    with pytest.raises(ValueError):
        salted_group_agg(skewed, "k", {"v": "median"})
