"""Targeted strict oracle check for entries touched by r16 edits.

Usage: python plans/r16/oracle_check.py <entry1> [entry2 ...]
Runs each entry at sf0.001 and sf0.01 via tests/oracle_util.compare
(the driver-strict local gate).
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> None:
    names = sys.argv[1:]
    from pyspark.sql import SparkSession

    from gofast_spark.plans.catalog import ORACLE_SQL, QUERIES
    from oracle_util import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            try:
                compare(spark, name, sf_dir, QUERIES[name], ORACLE_SQL[name])
                print(f"{sf_dir.split('/')[-1]} {name}: MATCH", flush=True)
            except Exception as e:  # noqa: BLE001
                failures.append((sf_dir, name, str(e)[:500]))
                print(
                    f"{sf_dir.split('/')[-1]} {name}: FAIL {str(e)[:300]}",
                    flush=True,
                )
    spark.stop()
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
