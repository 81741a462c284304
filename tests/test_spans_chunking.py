"""Duplicated-span detection and sliding-window chunking unit tests."""

from __future__ import annotations

import pytest

from gofast_spark.dedup.spans import (
    duplicated_spans,
    gram_positions,
    strip_duplicated_spans,
)
from gofast_spark.text.chunking import chunk_documents

SHARED = "one two three four five six seven eight"  # 8 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, f"alpha beta {SHARED} gamma delta"),
        (2, f"zeta {SHARED} eta theta iota"),
        (3, "totally unrelated words only here never repeated at all"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gram_positions_count(corpus):
    pos = gram_positions(corpus, k=8)
    # doc1: 12 tokens -> 5 grams; doc2: 12 -> 5; doc3: 9 -> 2
    got = dict(
        pos.groupBy("doc_id").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert got == {1: 5, 2: 5, 3: 2}


def test_duplicated_spans_find_shared_run(corpus):
    out = {r.doc_id: (r.span_start, r.span_end_excl, r.n_tokens)
           for r in duplicated_spans(corpus, k=8).collect()}
    # the shared 8-gram starts at token 2 in doc1, token 1 in doc2
    assert out[1] == (2, 10, 8)
    assert out[2] == (1, 9, 8)
    assert 3 not in out


def test_spans_merge_overlapping_grams(spark):
    # two docs sharing a 10-token passage -> three overlapping 8-grams
    # merge into ONE maximal span of 10 tokens
    shared = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    df = spark.createDataFrame(
        [(1, f"x {shared} y"), (2, f"{shared} z w")], ["doc_id", "text"]
    )
    out = {r.doc_id: (r.span_start, r.n_tokens)
           for r in duplicated_spans(df, k=8).collect()}
    assert out[1] == (1, 10)
    assert out[2] == (0, 10)


def test_strip_duplicated_spans(corpus):
    out = {r.doc_id: r.clean_text
           for r in strip_duplicated_spans(corpus, k=8).collect()}
    assert out[1] == "alpha beta gamma delta"
    assert out[2] == "zeta eta theta iota"
    assert out[3].startswith("totally unrelated")


def test_chunking_shapes(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 2 -> starts 0,2,4,6,8
    assert [r.tok_start for r in rows] == [0, 2, 4, 6, 8]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[-1].chunk_text == "t8 t9"  # tail keeps partial window
    assert rows[-1].n_tokens == 2


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only three tokens")], ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "only three tokens"


def test_chunking_validates_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
