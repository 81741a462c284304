"""Round-13 composition wave: flagship filter->dedup->shard->card chain,
the streaming dedup health-card twin, and the from-shingles report core
they share.  Each entry also carries a DuckDB oracle (the driver gate);
these tests pin the internal consistency and the batch==stream fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from gofast_spark.plans.catalog import QUERIES


def test_flagship_card_internal_consistency(spark, sf_small):
    row = QUERIES["corpus_flagship_card_documents"](spark, sf_small).collect()[0]
    # inventory funnel: raw >= kept >= survivors > 0
    assert row.n_docs >= row.n_kept >= row.n_survivors > 0
    # start-offset binning: shard indices are floor(start/2000), so the
    # count never exceeds floor(total/2000) + 1; a doc spanning >= 2
    # budget windows SKIPS an index, so there is no tight lower bound —
    # only positivity (asserting ceil-within-1 would be data-fragile:
    # the filter admits docs up to 100k tokens)
    assert 1 <= row.n_shards <= row.total_tokens // 2000 + 1
    assert row.max_shard_tokens <= 2000 + row.total_tokens  # sanity
    assert 0.0 < row.mean_fill_ratio <= 2.0
    assert row.n_shards_over_budget <= row.n_shards


def test_flagship_card_matches_constituents(spark, sf_small):
    """The chain must agree with its already-verified constituent
    entries run separately: survivor inventory with
    corpus_build_containment_survivors, keep count with the filter."""
    card = QUERIES["corpus_flagship_card_documents"](spark, sf_small).collect()[0]
    per_source = QUERIES["corpus_build_containment_survivors"](
        spark, sf_small
    ).collect()
    assert card.n_survivors == sum(r.n_docs for r in per_source)
    assert card.total_tokens == sum(r.tok_sum for r in per_source)


def test_stream_dedup_report_equals_batch(spark, sf_small):
    """availableNow replay of the two state grids must reproduce the
    batch health card byte-for-byte (they share the oracle, so the
    driver enforces this too — this is the fast local pin)."""
    got = QUERIES["stream_dedup_rate_report_documents"](spark, sf_small)
    want = QUERIES["dedup_rate_report_documents"](spark, sf_small)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_report_from_shingles_matches_delegate(spark):
    """ngram_dedup_report == ngram_dedup_report_from_shingles on the
    same shingle frame (the batch path is a thin delegate)."""
    from gofast_spark.dedup.minhash import doc_shingles
    from gofast_spark.dedup.ngram import (
        ngram_dedup_report,
        ngram_dedup_report_from_shingles,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over a lazy dog today"),
        (4, "completely different text about spark and parquet files"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = ngram_dedup_report(
        df, "doc_id", "text", k=3, max_df=64
    ).collect()[0]
    sh = doc_shingles(df, "doc_id", "text", k=3)
    n_docs = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    got = ngram_dedup_report_from_shingles(
        sh, "doc_id", n_docs, max_df=64
    ).collect()[0]
    assert tuple(want) == tuple(got)
    assert want.n_docs == 5  # None-text doc still counted in inventory
