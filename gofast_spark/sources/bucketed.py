"""Bucketed warehouse tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant join cost is the shuffle.  Hive-style bucketing
pays that shuffle ONCE at write time — rows are hash-distributed into a
fixed number of buckets on the join key and each bucket optionally
sorted — after which every join/aggregation on the bucket key reads
co-located data and Catalyst plans a SortMergeJoin with NO Exchange on
either side.  The same mechanism serves repeated joins (fact-to-fact),
incremental pipelines that join tonight's delta against yesterday's
snapshot, and groupBys on the bucket key.

Bucketing requires the session catalog (``saveAsTable`` — bucket
metadata lives in the metastore, not in the parquet files), which local
sessions have by default (Derby + ``spark-warehouse/``).  Bucket count
is a real tuning knob: shoot for buckets of 100-200 MB at production
scale, and keep it IDENTICAL on both sides of the intended join — a
mismatch reintroduces the shuffle on one side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    *,
    num_buckets: int = 8,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) catalog table."""
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.format(format).mode(mode).bucketBy(num_buckets, *bc)
    if sort_cols is not None:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def read_table(df_or_spark, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata intact — joins on the
    bucket key skip the shuffle when the session has
    ``spark.sql.sources.bucketing.enabled``, the default)."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.table(table)
