"""Table-maintenance operators: small-file compaction and key-skew
diagnosis — the daily hygiene jobs of a 100-TB lakehouse that the
reference's eager single-process model never needs (no analog in
gofast; Spark-native value-add alongside the z-order writer
``operators/zorder.py`` and SCD2 ``operators/scd.py``).

Small files are THE silent scan killer at scale: a 100-TB table in
1 MB files costs ~10^8 file opens, overwhelms the driver's listing, and
starves the scheduler.  Skewed keys are the silent shuffle killer: one
hot key serializes a join/agg stage behind a single reducer.  Both
operators are diagnosis-first — one pass, bounded output — with the
compactor as the fix for the first and salting/AQE (already used by the
repo's joins) the fix for the second.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_rows_per_file: int | None = None,
    target_files: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Rewrite a fragmented table into few large files; return a 1-row
    stats frame ``(files_before, files_after, n_rows)``.

    Sizing: ``target_files`` wins if given; otherwise
    ``ceil(n_rows / target_rows_per_file)``.  The rewrite is one
    ``repartition(n)`` round-robin shuffle — full-width but perfectly
    balanced output files; at 100 TB you run it per partition-directory
    (compact one day/shard at a time) so the shuffle stays bounded and
    the table stays queryable during the sweep.  Row count is taken
    from the write-side frame, files from the filesystem listing
    (driver-side metadata only, no data collect)."""
    df = spark.read.format(fmt).load(in_path)
    files_before = len(df.inputFiles())
    if target_files is None:
        if target_rows_per_file is None:
            raise ValueError("need target_files or target_rows_per_file")
        n_rows = df.count()
        target_files = max(1, math.ceil(n_rows / target_rows_per_file))
    df.repartition(target_files).write.mode("overwrite").format(fmt).save(
        out_path
    )
    out = spark.read.format(fmt).load(out_path)
    files_after = len(out.inputFiles())
    return spark.createDataFrame(
        [(files_before, files_after, out.count())],
        "files_before int, files_after int, n_rows bigint",
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """Per-key hot-spot report for a prospective join/agg key: the
    ``top_k`` heaviest keys with count, parts-per-million share, and
    skew factor (count / mean-count-per-key).  A skew factor around 1
    means a balanced shuffle; 100x means that key's reducer runs 100x
    longer than average — salt it or let AQE split it.

    One groupBy over the key, a 1-row broadcast of (total, distinct)
    from an aggregate OF the count table (no second data scan), then
    TakeOrderedAndProject — bounded output, no collect.  Share is an
    exact integer micro-unit so the result is partition-regrouping
    exact."""
    counts = df.where(F.col(key_col).isNotNull()).groupBy(
        F.col(key_col).alias("key")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.floor(F.col("cnt") * F.lit(1_000_000) / F.col("__total"))
            .cast("bigint")
            .alias("share_ppm"),
            (
                F.col("cnt")
                / (F.col("__total") / F.col("__nkeys").cast("double"))
            ).alias("skew_factor"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_k)
    )


def table_checksum(
    df: DataFrame,
    col_exprs: list,
) -> DataFrame:
    """Order-independent content checksum of a table: 1 row of
    ``(n_rows, checksum)`` where checksum = bit-XOR of a portable
    64-bit md5 hash of each row's canonical string (columns joined by
    the unit separator, chr(31), so column boundaries can't alias).

    The replica-validation primitive: two sides of a copy/migration
    compare one 8-byte result instead of moving data.  XOR aggregation
    is commutative/associative (partition- and order-independent) and
    cannot overflow, unlike a sum of hashes (which silently wraps in a
    64-bit engine but widens to 128-bit in others — an engine-parity
    trap).  Callers pass canonical expressions per column (stable
    casts: ints/strings as-is, money as integer cents) because raw
    float formatting differs between engines."""
    from gofast_spark.text.hashing import md5_hash64

    sep = chr(31)
    canon = F.concat_ws(
        sep, *[F.coalesce(c.cast("string"), F.lit(chr(0))) for c in col_exprs]
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(md5_hash64(canon)).alias("checksum"),
    )


def partition_stats_report(
    df: DataFrame,
    part_col: str,
    stat_cols,
) -> DataFrame:
    """Zone-map / data-skipping readout per partition value (the
    min/max/null statistics Parquet row groups and lakehouse manifests
    keep — see e.g. the Delta/Iceberg file-skipping design, and the
    reference's data-audit surface): for each value of ``part_col``,
    row count plus per-column min, max, and null count.

    ONE hash aggregate; the output is partition-count-sized, the frame
    a query planner (or a human) scans to judge which partitions a
    predicate can skip."""
    cols = [stat_cols] if isinstance(stat_cols, str) else list(stat_cols)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"nulls_{c}"),
        ]
    return df.groupBy(F.col(part_col).alias("partition")).agg(*aggs)
