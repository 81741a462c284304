"""Plan-shape CI for the round-6 retrieval/graph/sketch operators:

- the bloom probe is a pure scan-side filter (no exchange, no join
  before the pruned rows exist);
- BM25 top-k ends in TakeOrderedAndProject (per-partition heaps), and
  its df/stat joins broadcast;
- one PageRank iteration is equi-join-only (no cartesian, no
  nested-loop);
- duplicated-span detection is equi-join-only and its per-doc window
  sort partitions by doc (never a global single-reducer sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gofast_spark.plans.catalog import QUERIES, _t


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_probe_is_scan_side_filter(spark, sf_small):
    from gofast_spark.operators.bloom import bloom_build, bloom_might_contain

    dim = spark.range(0, 50).withColumnRenamed("id", "k")
    bm = bloom_build(dim, "k", n_bits=4096, k=3)
    fact = _t(spark, sf_small, "orders")
    pruned = fact.where(bloom_might_contain("o_custkey", bm, k=3))
    plan = _plan(pruned)
    assert "Exchange" not in plan  # prune happens before any shuffle
    assert "Join" not in plan  # literal bitmap, not a join


def test_bm25_topk_take_ordered(spark, sf_small):
    plan = _plan(QUERIES["bm25_topk_documents"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_iteration_equi_joins_only(spark):
    from gofast_spark.ml.graph import edges_from_pairs, pagerank

    pairs = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(40)], ["a", "b"]
    )
    e = edges_from_pairs(pairs, "a", "b")
    plan = _plan(pagerank(e, iterations=2))
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the deliberate 1-row
    # broadcast crossJoin(agg) idiom (always BuildRight, Cross)
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "Cross" in ln


def test_spans_window_partitions_by_doc(spark, sf_small):
    from gofast_spark.dedup.spans import duplicated_spans

    d = _t(spark, sf_small, "documents").select("doc_id", "text")
    plan = _plan(duplicated_spans(d, k=8))
    assert "CartesianProduct" not in plan
    # the islands window must be keyed on doc_id, not a global orderBy
    win = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win and any("doc_id" in ln for ln in win)


def test_cms_estimate_broadcasts_sketch(spark, sf_small):
    from gofast_spark.functions.cms import cms_build, cms_estimate

    ev = _t(spark, sf_small, "events")
    sk = cms_build(ev, "event_type")
    cand = ev.select("event_type").distinct()
    plan = _plan(cms_estimate(sk, cand, "event_type"))
    assert "BroadcastHashJoin" in plan


def test_dsir_plan_shapes(spark, sf_small):
    # resample ends in a per-partition top-k; the dim-sized ratio frame
    # broadcasts; no cartesian anywhere (the 1-row total crossJoins are
    # the deliberate broadcast idiom)
    plan = _plan(QUERIES["dsir_resample_documents"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "Cross" in ln
