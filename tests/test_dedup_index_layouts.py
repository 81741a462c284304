"""Round-14 ask #3: the streaming dedup health card's THREE state
layouts must produce identical reports —

1. batch (one-shot over raw documents, dedup_rate_report_documents),
2. complete-mode streaming state grids (the r13 twin),
3. the PRODUCTION layout: CDC-apply MERGE upserts of the shingle index
   + exact grid into warehouse tables, health card as a separate job
   over the tables (streaming/ops.py stream_dedup_index_upsert +
   dedup_health_card_from_tables).

Layout 3 is what the r13 twin's docstring promised in prose; this test
makes it an executable, equality-pinned contract, including
at-least-once robustness (a re-delivered slice must merge, not
inflate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gofast_spark.plans.catalog import QUERIES


def _run_upsert_layout(spark, src_df, tmp_path, tag):
    from gofast_spark.streaming import (
        dedup_health_card_from_tables,
        stream_dedup_index_upsert,
    )

    src = str(tmp_path / f"src_{tag}")
    src_df.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(src_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sh_path, ex_path, queries = stream_dedup_index_upsert(
        stream,
        str(tmp_path / f"idx_{tag}"),
        checkpoint=str(tmp_path / f"ckpt_{tag}"),
    )
    assert queries is None  # availableNow drains synchronously
    return dedup_health_card_from_tables(spark, sh_path, ex_path)


def test_three_layouts_equal(spark, sf_small, tmp_path):
    batch = QUERIES["dedup_rate_report_documents"](spark, sf_small)
    stream_state = QUERIES["stream_dedup_rate_report_documents"](
        spark, sf_small
    )
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    upsert = _run_upsert_layout(spark, docs, tmp_path, "main")
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, stream_state.collect()))
    u = sorted(map(tuple, upsert.collect()))
    assert batch.columns == stream_state.columns == upsert.columns
    assert b == s == u


def test_upsert_layout_at_least_once_safe(spark, sf_small, tmp_path):
    """Re-delivering a slice of the corpus (UNION of docs with a
    duplicated subset) must not change the maintained-index health
    card: the MERGE keys absorb replays."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    replayed = docs.unionAll(docs.limit(25))
    clean = _run_upsert_layout(spark, docs, tmp_path, "clean")
    redel = _run_upsert_layout(spark, replayed, tmp_path, "redel")
    assert sorted(map(tuple, clean.collect())) == sorted(
        map(tuple, redel.collect())
    )
