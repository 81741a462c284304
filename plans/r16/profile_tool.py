"""Profiling helper for r16 optimization: time queries through the noop
sink (min-of-N) and dump .explain('formatted') to plans/r16/<name>_<tag>.txt.

Usage: python plans/r16/profile_tool.py <tag> <query1> [query2 ...]
  tag: 'before' or 'after' (plan file suffix)
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     PROFILE_REPS (default 3).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    from gofast_spark import get_session
    from gofast_spark.plans.catalog import QUERIES

    spark = get_session("gofast-spark-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = QUERIES[name](spark, sf_dir)
        # capture plan
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"/root/repo/plans/r16/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        # warm pass (codegen/JIT), then timed reps
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(f"{name}: min={min(runs):.3f} runs={runs}", flush=True)
    spark.stop()
    print({k: min(v) for k, v in out.items()})


if __name__ == "__main__":
    main()
