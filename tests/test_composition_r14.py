"""Round-14 composition wave pins: the streaming flagship twin equals
the batch flagship byte-for-byte, and the persisted-stage driver entry
equals the toy-layout entry (both pairs also share oracles, so the
driver enforces the same — these are the fast local pins)."""

from __future__ import annotations

from gofast_spark.plans.catalog import QUERIES


def test_stream_flagship_card_equals_batch(spark, sf_small):
    got = QUERIES["stream_corpus_flagship_card_documents"](spark, sf_small)
    want = QUERIES["corpus_flagship_card_documents"](spark, sf_small)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_persisted_stage_build_equals_toy(spark, sf_small):
    got = QUERIES["corpus_build_persisted_stage_survivors"](spark, sf_small)
    want = QUERIES["corpus_build_containment_survivors"](spark, sf_small)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
