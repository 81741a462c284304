"""Per-query job/stage survey (guide §1): run each headline query once
warm, then once measured inside a job group, and report wall seconds,
number of Spark jobs, and number of stages.  Queries with high job
counts are driver-serialized (eager checkpoints / per-round broadcast
builds / iterative loops) — each job is a full scheduling barrier, so
job count is the structural metric behind toy-scale overhead AND
100-TB barrier counts.

Usage: python plans/r15/job_survey.py [query ...]   (default: all headline)
Prints one JSON line {name: {"wall": s, "jobs": n, "stages": n}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from gofast_spark import get_session
    from gofast_spark.plans.catalog import QUERIES

    sys.path.insert(0, "/root/repo")
    import bench

    names = sys.argv[1:] or [n for n in bench.HEADLINE if n in QUERIES]
    spark = get_session("gofast-spark-jobsurvey", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    out = {}
    for name in names:
        # warm pass (codegen/JIT + any first-run planning)
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        sc.setJobGroup(f"survey:{name}", name)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(f"survey:{name}")
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        out[name] = {
            "wall": round(wall, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
        }
        print(
            f"{name}: wall={wall:.2f}s jobs={len(job_ids)} stages={n_stages}",
            file=sys.stderr,
            flush=True,
        )
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
