"""Interleaved A/B profiler: times queries through the noop sink
(min-of-N after a warm pass) in ONE fresh session, prefixed by the
bench's host-calibration probe so cross-invocation host drift is
visible.  Prints one JSON line.

Usage: python plans/r16/ab_tool.py <label> <query1> [query2 ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     PROFILE_REPS (default 3).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    from pyspark.sql import functions as F

    from gofast_spark import get_session
    from gofast_spark.plans.catalog import QUERIES

    spark = get_session("gofast-spark-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def calib() -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 8_000_000_000, 1, 32).select(
                F.expr("bit_xor(xxhash64(id))")
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    out = {"label": label, "calib_before": calib(), "queries": {}}
    for name in names:
        spark.sparkContext.setJobDescription(f"ab:{label}:{name}")
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out["queries"][name] = runs
        print(f"{label} {name}: min={min(runs):.3f} runs={runs}", flush=True)
    out["calib_after"] = calib()
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
