"""Per-query job/stage/shuffle-byte survey (guide §1, r16 extension of
the r15 tool): run each headline query once warm, then once measured
inside a job group, and report wall seconds, number of Spark jobs,
number of stages, and shuffle read/write + input bytes summed over the
query's stages (via the UI REST API).  Job count is the structural
metric behind toy-scale overhead AND 100-TB barrier counts; shuffle
bytes are the scale-evidence metric VERDICT r15 item 6 asks for now
that sf0.1 wall time is overhead-saturated.

Usage: python plans/r16/job_survey.py [--out FILE] [query ...]
       (default: all headline)
Prints one JSON line {name: {"wall": s, "jobs": n, "stages": n,
"shuffle_read": b, "shuffle_write": b, "input": b}}.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _stage_metrics(ui_url: str, app_id: str) -> dict[int, dict]:
    """stageId -> {shuffle_read, shuffle_write, input} for all completed
    stages (latest attempt wins)."""
    url = f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.loads(r.read())
    out: dict[int, dict] = {}
    for s in stages:
        out[s["stageId"]] = {
            "shuffle_read": s.get("shuffleReadBytes", 0),
            "shuffle_write": s.get("shuffleWriteBytes", 0),
            "input": s.get("inputBytes", 0),
        }
    return out


def main() -> None:
    argv = sys.argv[1:]
    out_file = None
    if argv and argv[0] == "--out":
        out_file = argv[1]
        argv = argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from gofast_spark import get_session
    from gofast_spark.plans.catalog import QUERIES

    import bench

    names = argv or [n for n in bench.HEADLINE if n in QUERIES]
    spark = get_session(
        "gofast-spark-jobsurvey",
        master=f"local[{cpus}]",
        **{"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui_url = sc.uiWebUrl
    app_id = sc.applicationId

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
        stage_ids: set[int] = set()
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                stage_ids.update(info.stageIds)
        sread = swrite = sinput = 0
        try:
            metrics = _stage_metrics(ui_url, app_id)
            for sid in stage_ids:
                m = metrics.get(sid)
                if m:
                    sread += m["shuffle_read"]
                    swrite += m["shuffle_write"]
                    sinput += m["input"]
        except Exception as e:  # noqa: BLE001
            print(f"  (stage metrics unavailable: {e})", file=sys.stderr)
        out[name] = {
            "wall": round(wall, 3),
            "jobs": len(job_ids),
            "stages": len(stage_ids),
            "shuffle_read": sread,
            "shuffle_write": swrite,
            "input": sinput,
        }
        print(
            f"{name}: wall={wall:.2f}s jobs={len(job_ids)} "
            f"stages={len(stage_ids)} shW={swrite} shR={sread} in={sinput}",
            file=sys.stderr,
            flush=True,
        )
    spark.stop()
    line = json.dumps(out)
    if out_file:
        with open(out_file, "w") as f:
            f.write(line + "\n")
    print(line, flush=True)


if __name__ == "__main__":
    main()
