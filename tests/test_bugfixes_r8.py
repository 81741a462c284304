"""Regression tests for the round-7 ADVICE/verdict findings (fixed in
round 8):

1. funnel / funnel_latencies: each frontier is localCheckpoint'd so the
   per-step actions don't replay the whole join chain from the raw
   stream (lineage stays flat instead of growing per step).
2. bigram_pmi: empty/whitespace-only documents are excluded BEFORE the
   split (split('') returns [''] so a size guard never fired) — they
   must not contribute a '' unigram or inflate n_tokens.
3. stream_merge_upsert _recover: the newest staging/__old_ snapshot is
   picked by NUMERIC batch-id suffix, not lexicographically
   (staging_9 must lose to staging_10).
4. calibration_curve: scores outside [0, 1] are excluded instead of
   producing negative bins with corrupted micro-unit rounding.
5. label_propagation: string node ids fail loudly; symmetrize=True
   handles a directed edge list (dst-only nodes are no longer dropped).
6. rfm_segments / funnel_latencies: 'sketch' percentile mode plans a
   percentile_approx (bounded memory) and 'auto' stays exact below the
   threshold; the default ref_date path is collect-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _events(spark):
    rows = []
    # u1 converts view->click->purchase; u2 view->click; u3 view only
    rows += [Row(u=1, ts="2024-01-01 00:00:00", ty="view"),
             Row(u=1, ts="2024-01-01 00:10:00", ty="click"),
             Row(u=1, ts="2024-01-01 01:10:00", ty="purchase"),
             Row(u=2, ts="2024-01-02 00:00:00", ty="view"),
             Row(u=2, ts="2024-01-02 00:30:00", ty="click"),
             Row(u=3, ts="2024-01-03 00:00:00", ty="view")]
    df = spark.createDataFrame(rows)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_frontier_lineage_is_truncated(spark):
    """With per-step checkpoints the returned counts are built from
    checkpointed (user-sized) frames — the logical plan of the final
    frontier must not reference the raw event relation."""
    from gofast_spark.operators.funnel import funnel

    out = funnel(_events(spark), "u", "ts", "ty",
                 ["view", "click", "purchase"])
    rows = {r["step"]: r for r in out.collect()}
    assert rows["view"]["n_users"] == 3
    assert rows["click"]["n_users"] == 2
    assert rows["purchase"]["n_users"] == 1
    assert rows["purchase"]["conv_from_first"] == pytest.approx(1 / 3)


def test_funnel_latencies_values_and_truncation(spark):
    from gofast_spark.operators.funnel import funnel_latencies

    out = funnel_latencies(_events(spark), "u", "ts", "ty",
                           ["view", "click", "purchase"])
    rows = {r["transition"]: r for r in out.collect()}
    assert rows["view->click"]["n_users"] == 2
    # u1: 600 s, u2: 1800 s
    assert rows["view->click"]["avg_latency_sec"] == pytest.approx(1200.0)
    assert rows["view->click"]["median_latency_sec"] == pytest.approx(1200.0)
    assert rows["click->purchase"]["n_users"] == 1
    assert rows["click->purchase"]["median_latency_sec"] == pytest.approx(
        3600.0
    )
    # checkpointed frontiers: the union plan must not grow with the raw
    # event relation repeated once per transition
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan  # checkpointed frames appear as RDD scans


def test_bigram_pmi_ignores_empty_documents(spark):
    from gofast_spark.text.cooccur import bigram_pmi

    base = [Row(text="alpha beta alpha beta alpha beta alpha beta "
                     "alpha beta")]
    with_empty = base + [Row(text=""), Row(text="   "), Row(text="\n\t")]
    a = bigram_pmi(spark.createDataFrame(base), "text", min_count=1,
                   top_k=5).collect()
    b = bigram_pmi(spark.createDataFrame(with_empty), "text", min_count=1,
                   top_k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], (
        "empty documents must not shift counts or PMI"
    )
    assert all(r["w1"] and r["w2"] for r in b)


def test_stream_recover_prefers_numeric_batch_order(spark, tmp_path):
    """__old_10 must beat __old_9 even though '10' < '9'
    lexicographically (crash debris surviving across batches)."""
    import os

    from gofast_spark.streaming.ops import stream_merge_upsert

    table = str(tmp_path / "state")
    for bid, ver in ((9, 1), (10, 2)):
        spark.createDataFrame(
            [(1, ver * 100, ver)], "k int, v int, ver int"
        ).write.parquet(f"{table}__old_{bid}")

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(2, 20, 1)], "k int, v int, ver int"
    ).write.json(src)
    stream = spark.readStream.schema("k int, v int, ver int").json(src)
    stream_merge_upsert(
        stream, table, "k",
        checkpoint=str(tmp_path / "ckpt"), dedup_order_col="ver",
    )
    got = {r["k"]: (r["v"], r["ver"])
           for r in spark.read.parquet(table).collect()}
    assert got == {1: (200, 2), 2: (20, 1)}, (
        f"recovery picked the lexicographic max snapshot: {got}"
    )
    assert not [p for p in os.listdir(tmp_path) if "__old_" in p]


def test_calibration_curve_excludes_out_of_domain_scores(spark):
    from gofast_spark.metrics import calibration_curve

    df = spark.createDataFrame(
        [Row(s=0.05, y=1), Row(s=0.95, y=0),
         Row(s=-0.4, y=1), Row(s=1.7, y=0)]
    )
    out = calibration_curve(df, "s", "y", bins=10).collect()
    bins = {r["bin"] for r in out}
    assert bins == {0, 9}, f"out-of-domain scores leaked into bins: {bins}"
    assert sum(r["n"] for r in out) == 2


def test_label_propagation_contract(spark):
    from gofast_spark.ml.graph import label_propagation

    directed = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3)], "src bigint, dst bigint"
    )
    out = {r["node"]: r["label"]
           for r in label_propagation(directed, iterations=2,
                                      symmetrize=True).collect()}
    assert set(out) == {1, 2, 3}, "symmetrize must surface dst-only nodes"

    strings = spark.createDataFrame([Row(src="a", dst="b")])
    with pytest.raises(TypeError, match="numeric"):
        label_propagation(strings)


def test_rfm_sketch_mode_plans_percentile_approx(spark):
    from gofast_spark.operators.funnel import rfm_segments

    ev = _events(spark).withColumn("amt", F.lit(10.0))
    exact = rfm_segments(ev, "u", "ts", "amt", quantile_mode="auto")
    sketch = rfm_segments(ev, "u", "ts", "amt", quantile_mode="sketch")
    # auto below threshold == exact: identical rows
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, rfm_segments(ev, "u", "ts", "amt",
                                quantile_mode="exact").collect())
    )
    plan = sketch._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in plan, (
        "sketch mode must use the bounded-memory percentile sketch"
    )
    exact_plan = exact._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" not in exact_plan


def test_funnel_latency_sketch_mode(spark):
    from gofast_spark.operators.funnel import funnel_latencies

    out = funnel_latencies(_events(spark), "u", "ts", "ty",
                           ["view", "click"], median_mode="sketch")
    r = out.collect()[0]
    assert r["n_users"] == 2
    # GK sketch at 1e-4 accuracy returns an observed value (600 or 1800)
    assert r["median_latency_sec"] in (600.0, 1800.0)
