"""Plan contract for the corpus-build entries (r12 perf fix).

`.where("keep")` on corpus_filter output lets Catalyst collapse the
whole rule chain into a Filter whose six conjuncts each re-derive the
full signal battery (measured 53 s inlined vs 4.6 s as a once-per-row
projection at sf0.1 — a 34x entry-level regression when compounded
with the single-split scan pushdown).  The entries materialize the
TAGGED frame and filter the stored boolean; this test pins that shape
so a refactor can't silently reintroduce the inlined filter."""

from __future__ import annotations

import pytest

from gofast_spark.plans.catalog import QUERIES


@pytest.mark.parametrize(
    "name",
    ["corpus_build_pipeline", "corpus_build_containment_survivors"],
)
def test_keep_filter_is_stored_boolean(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [
        ln
        for ln in plan.splitlines()
        if "Filter" in ln and "regexp_replace" in ln
    ]
    assert not bad, (
        f"{name}: keep-filter re-inlined the signal battery into a "
        f"Filter node (tag-then-filter contract broken): {bad[0][:200]}"
    )
