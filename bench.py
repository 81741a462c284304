"""Benchmark harness: runs headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full scan +
compute, no driver collect bottleneck, no disk write noise).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_revenue_by_region",
    "q1_pricing_summary",
    "merge_datasets_orders_customer",
    "smart_group_having",
    "nearest_join_acctbal",
    "cumulative_revenue_by_day",
    "dedup_exact_distinct",
    "rank_suppliers_in_nation",
    "hash_split_test_counts",
    "moving_average_revenue",
    # round 2: LLM-pipeline + ts + stats headline ops
    "minhash_near_dup_pairs",
    "embedding_cosine_topk",
    "text_quality_language",
    "ts_engineering_daily_events",
    "anova_events",
    # round 3: quality / ts-interpolation / streaming perf coverage
    "outliers_iqr_clip_acctbal",
    "interpolate_daily_gaps",
    "streaming_window_counts",
    # round 6: as-of join, end-to-end near-dedup (pairs -> connected
    # components -> canonical), PQ-ADC ANN, composite corpus filter
    "asof_join_click_view",
    "near_dup_canonical_survivors",
    "pq_adc_topk_embeddings",
    "corpus_filter_documents",
    # round 7: semantic dedup, decontamination, sequence packing,
    # classifier scoring, closed-form OLS
    "semantic_dedup_embeddings",
    "contamination_check_documents",
    "pack_sequences_documents",
    "quality_classifier_documents",
    "ols_normal_eq_lineitem",
    # round 6b: retrieval, substring dedup, graph centrality, streaming
    # vocabulary maintenance
    "bm25_topk_documents",
    "duplicated_spans_documents",
    "pagerank_customer_supplier",
    "stream_token_counts_documents",
    # round 6c: BPE training, DSIR selection, cross-corpus dedup,
    # span-corruption pair generation
    "bpe_merges_documents",
    "dsir_resample_documents",
    "incremental_dedup_pairs",
    "span_corruption_documents",
    # round 7: in-plan PACF, SCD2 history, URL dedup, dataset-card
    # aggregates, PMI collocations, quality-weighted dedup survivors
    "pacf_daily_events",
    "scd2_history_customer",
    "url_dedup_documents",
    "corpus_report_documents",
    "bigram_pmi_documents",
    "near_dup_best_survivors",
    # round 8: one-pass model selection (CV + lambda sweep), graph
    # composition, streaming funnel/retention, lakehouse maintenance
    "cv_ols_rmse_lineitem",
    "ridge_cv_sweep_lineitem",
    "community_triangle_density",
    "stream_funnel_counts",
    "key_skew_report_orders",
    "table_checksum_customer",
    "boosted_stumps_orders",
    "kmeans_lloyd_embeddings",
    "dbscan_embeddings",
    "frequent_pairs_lineitem",
    # round 8b: item-item CF join, one-scan bagging ensemble, sequential
    # A/B fold, rank-correlation grid, ranking metrics
    "item_cosine_topk_lineitem",
    "bagged_stumps_orders",
    "msprt_ab_events",
    "kendall_tau_lineitem",
    "gains_table_orders",
    # round 8 extension-2: graph/causal/forecast flagships
    "textrank_keywords_documents",
    "good_turing_documents",
    "link_prediction_modgraph",
    "aipw_ate_orders",
    # round 8 extension-3: collocation mining, NB text classification,
    # HITS, k-core, JS source divergence, RAKE, KMV sketch, influence
    "llr_collocations_documents",
    "multinomial_nb_confusion_documents",
    "hits_scores_modgraph",
    "kcore_members_modgraph",
    "js_divergence_sources",
    "rake_keywords_documents",
    "kmv_distinct_users_events",
    "cooks_distance_lineitem",
    # round 8 closing wave: survival effect size, L1 regression path,
    # one-pass experimentation report, cointegration
    "cox_ph_events",
    "elastic_net_cd_lineitem",
    "ab_experiment_report_events",
    "engle_granger_daily",
    # round 11 breadth: sequential search, grouped survival,
    # per-source drift, info theory
    "smbo_ridge_lineitem",
    "successive_halving_ridge_lineitem",
    "cox_ph_by_segment_events",
    "psi_by_source_documents",
    "ks_drift_by_type_events",
    "mutual_info_events",
    # round 11 second breadth wave: exact retrieval metrics, per-source
    # Wasserstein drift, relational unit root, rank post-hoc
    "retrieval_metrics_embeddings",
    "wasserstein_by_source_documents",
    "adf_test_daily",
    "dunn_test_events",
    # round 11 third breadth wave: corpus richness/perplexity, rank-based
    # variance homogeneity, concentration
    "lexical_richness_documents",
    "cross_perplexity_documents",
    "fligner_killeen_events",
    "hhi_revenue_by_nation",
    # round 12 composition wave: dataset cards, shared-shingle dedup
    # health report, containment-dedup corpus build
    "dataset_card_documents",
    "dataset_card_by_source_documents",
    "dedup_rate_report_documents",
    "corpus_build_containment_survivors",
    # round 13: flagship filter->dedup->shard->card chain, streaming
    # dedup health-card twin, the two converted ex-parked entries
    "corpus_flagship_card_documents",
    "stream_dedup_rate_report_documents",
    "kernel_pca_embeddings",
    "linkage_matrix_nation",
    # round 14: converted ex-parked entries (exact-kmeans IVF, power-
    # iteration DCA), streaming flagship twin, persisted-stage build,
    # multimodal media card, varimax
    "embedding_ivf_kmeans_topk",
    "dca_segment_status_orders",
    "stream_corpus_flagship_card_documents",
    "corpus_build_persisted_stage_survivors",
    "multimodal_media_card_documents",
    "varimax_loadings_lineitem",
]


def _calibrate(spark, reps: int = 3) -> float:
    """Fixed CPU-bound probe (r12 verdict ask #5): min-of-reps wall time
    of a deterministic 8B-row xxhash64 fold across 32 splits — pure
    whole-stage-codegen compute, no shuffle beyond the final 1-row agg,
    no disk.  The probe measures HOST throughput, not engine changes:
    r12 burned a round proving a 84.7->143.8 s headline swing was a
    throttled container (three idle same-artifact runs spanned
    103-181 s).  Round-over-round comparisons should use
    value / calib_before_sec; a calib drift between rounds is host
    noise, not a regression."""
    from pyspark.sql import functions as F

    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        spark.range(0, 8_000_000_000, 1, 32).select(
            F.expr("bit_xor(xxhash64(id))")  # xor-fold: no ANSI overflow
        ).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from gofast_spark import get_session
    from gofast_spark.plans.catalog import QUERIES

    spark = get_session("gofast-spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    # One untimed warm pass compiles whole-stage codegen and JIT-warms the
    # generated classes (first execution of a complex plan pays ~10-20s of
    # compilation that is irrelevant at cluster scale); then REPS timed
    # passes per query with min + spread reported — single-shot numbers
    # swing severalfold on the shuffle-heavy queries (shuffle-file/GC
    # noise), so min-of-3 is the stable round-over-round signal.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold_total = round(time.perf_counter() - t0, 3)
    # calibrate AFTER the cold pass (so cold_sec keeps its r01-r12
    # semantics — first-execution including JIT) but BEFORE the timed
    # reps, which are what the probe normalizes
    calib_before = _calibrate(spark)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        spread[name] = runs

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    calib_after = _calibrate(spark)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "cold_sec": cold_total,
        "sf": sf_val,
        # host-load calibration (see _calibrate): compare rounds via
        # value_per_calib, and distrust the whole run when before/after
        # disagree badly (the host was throttled mid-run)
        "calib_probe": "range8B_xxhash64_xor_32splits_min3",
        "calib_before_sec": calib_before,
        "calib_after_sec": calib_after,
        "value_per_calib": round(total / calib_before, 3)
        if calib_before
        else None,
    }
    # Full detail (incl. per-rep spreads) to an artifact the driver/judge
    # can read even when stdout capture truncates; stdout carries ONE
    # compact final line with nothing after it (r6 driver parse failure:
    # stage noise + a very long line pushed the JSON head out of the
    # tail-capture window).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json"),
        "w",
    ) as f:
        json.dump({**result, "runs": spread}, f, indent=1)
    spark.stop()
    sys.stdout.flush()
    # The stdout line must fit the driver's 2000-char tail capture
    # (r8 verdict ask #7: at 72 headline queries the full per-query dict
    # alone overflows it) — report the 10 slowest queries inline and
    # point at bench_result.json for the rest.
    slow10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        **result,
        "queries": slow10,
        "n_queries": len(timings),
        "queries_full": "bench_result.json",
    }
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
