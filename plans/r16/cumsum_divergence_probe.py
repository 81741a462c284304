"""Probe: does the OLD (un-checkpointed) distributed_cumsum shape let
its two range-exchange legs sample different boundaries and produce a
WRONG prefix sum at partial-sampling scale?  Compares the old in-line
shape and the new (checkpointed) implementation against the exact
single-reducer window on a 200k-row frame.

Usage: python plans/r16/cumsum_divergence_probe.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from gofast_spark import get_session
from gofast_spark.operators.prefix import distributed_cumsum


def old_cumsum(df, order_col, value_col, out_col="cumsum", n=32):
    part = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("__local", F.sum(value_col).over(w_local))
    totals = part.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "__off", F.sum("__tot").over(w_off) - F.col("__tot")
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__pid", "__local", "__off")
    )


def main() -> None:
    spark = get_session("cumsum-probe", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    # 200k rows, shuffled key order, 16 input partitions: big enough that
    # RangePartitioner samples (60 rows/partition) rather than reading all
    base = (
        spark.range(0, 200_000, 1, 16)
        .select(
            F.xxhash64("id").alias("k"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) + 1).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    exact = base.withColumn(
        "c",
        F.sum("v").over(
            Window.orderBy("k").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )

    def n_diff(got):
        j = exact.alias("e").join(got.alias("g"), "k")
        return j.where(F.col("e.c") != F.col("g.c")).count()

    for label, fn in (
        ("old (lazy, two range exchanges)", old_cumsum),
        ("new (checkpoint-pinned)", lambda d, o, v: distributed_cumsum(
            d, o, v, out_col="cumsum", num_partitions=32
        )),
    ):
        bad = 0
        for rep in range(3):
            got = (
                fn(base, "k", "v")
                .select("k", F.col("cumsum").alias("c"))
            )
            d = n_diff(got)
            bad += d
            print(f"{label} rep{rep}: rows diverging from exact = {d}",
                  flush=True)
        print(f"{label}: TOTAL diverging rows over 3 reps = {bad}")
    spark.stop()


if __name__ == "__main__":
    main()
