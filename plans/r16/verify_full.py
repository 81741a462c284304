"""Full-catalog verify: entry() smoke at sf0.001 + every oracle-backed
entry vs DuckDB at sf0.01 via the strict tests/oracle_util.compare gate."""
from __future__ import annotations

import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> None:
    from pyspark.sql import SparkSession

    from oracle_util import compare

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = mod.entry(spark)
    n = len(df.collect())
    print(f"entry rows: {n}", flush=True)
    assert n > 0
    queries = mod.queries()
    oracles = mod.oracle_sql()
    t0 = time.time()
    fails = []
    stamps = {}
    for i, (name, sql) in enumerate(sorted(oracles.items())):
        ok = True
        try:
            compare(spark, name, "/root/testdata/sf0.01", queries[name], sql)
            print(f"[{i + 1}/{len(oracles)}] {name}: MATCH", flush=True)
        except Exception as e:  # noqa: BLE001
            ok = False
            fails.append(name)
            print(f"[{i + 1}/{len(oracles)}] {name}: FAIL {str(e)[:300]}",
                  flush=True)
        stamps[name] = {
            "match": ok,
            "kind": "oracle",
            "sf_dir": "/root/testdata/sf0.01",
            "checked_at": __import__("datetime").datetime.now(
                __import__("datetime").timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ"),
        }
    spark.stop()
    # refresh the committed per-entry sweep artifact (same format as the
    # r14 LOCAL_SWEEP.json) when asked
    if "--stamp" in sys.argv:
        import json

        with open("/root/repo/LOCAL_SWEEP.json", "w") as f:
            json.dump(stamps, f, indent=1, sort_keys=True)
        print("LOCAL_SWEEP.json refreshed", flush=True)
    print(f"done in {time.time() - t0:.0f}s: {len(fails)} failures {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
