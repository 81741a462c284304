"""Blanket plan invariants over the ENTIRE catalog (not just the bench
headliners): no catalog entry may plan a cartesian product or a
row-at-a-time Python UDF, at any position in the rotation.  This is
the repo's strongest single scale guarantee — every operator a user
can reach through `queries()` keeps the two invariants that matter
most at 100 TB.

Streaming entries drain their micro-batches on invocation and return a
memory-sink read-back; auditing that (trivial) plan is harmless, so no
entry is excluded.  Runs in one Spark session (~3 min at sf0.001 for
~250 entries) and reports every violator at once.
"""

from __future__ import annotations

from gofast_spark.plans.audit import audit_plan
from gofast_spark.plans.catalog import QUERIES


def test_every_catalog_entry_no_cartesian_no_row_udfs(spark, sf_small):
    bad: list[tuple[str, str, object]] = []
    for name, fn in QUERIES.items():
        a = audit_plan(fn(spark, sf_small))
        if a["cartesian_joins"]:
            bad.append((name, "cartesian_joins", a["cartesian_joins"]))
        if a["python_row_udfs"]:
            bad.append((name, "python_row_udfs", a["python_row_udfs"]))
    assert not bad, f"{len(bad)} catalog entries violate plan invariants: {bad}"
