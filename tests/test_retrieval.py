"""BM25 / tf-idf retrieval and bigram-LM scoring unit tests
(hand-computed expectations on tiny corpora)."""

from __future__ import annotations

import math

import pytest

from gofast_spark.text.bm25 import (
    bm25_topk,
    build_postings,
    corpus_stats,
    tfidf_topk_terms,
)
from gofast_spark.text.lm import score_documents, train_bigram_lm


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark join spark"),
        (2, "join filter"),
        (3, "window sort window window"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_and_stats(corpus):
    p = build_postings(corpus)
    got = {(r.doc_id, r.term): (r.tf, r.dl) for r in p.collect()}
    assert got[(1, "spark")] == (2, 3)
    assert got[(1, "join")] == (1, 3)
    assert got[(3, "window")] == (3, 4)
    s = corpus_stats(p).collect()[0]
    assert s.n_docs == 3
    assert s.avgdl == pytest.approx(3.0)


def test_bm25_scores_match_formula(corpus):
    out = bm25_topk(corpus, ["spark", "join"], k=3).collect()
    # hand formula, k1=1.2 b=0.75, N=3, avgdl=3
    def idf(dfT):
        return math.log(1 + (3 - dfT + 0.5) / (dfT + 0.5))

    def w(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))

    exp1 = idf(1) * w(2, 3) + idf(2) * w(1, 3)
    exp2 = idf(2) * w(1, 2)
    got = {r.doc_id: r.score for r in out}
    assert got[1] == pytest.approx(exp1, abs=1e-6)
    assert got[2] == pytest.approx(exp2, abs=1e-6)
    assert 3 not in got  # no query term
    # ranking: doc 1 has both terms
    assert out[0].doc_id == 1


def test_bm25_rejects_empty_query(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, [])


def test_tfidf_topk_terms(corpus):
    out = tfidf_topk_terms(corpus, terms_per_doc=1).collect()
    top = {r.doc_id: r.term for r in out}
    # doc 3's "window" (tf=3, df=1) dominates; doc 1's "spark" likewise
    assert top[3] == "window"
    assert top[1] == "spark"


def test_bigram_lm_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
    )
    m = {(r.ctx, r.nxt): (r.c_bigram, r.c_ctx, r.vocab)
         for r in train_bigram_lm(df).collect()}
    # bigrams: doc1 <s>-a a-b b-a a-b ; doc2 <s>-a a-b
    assert m[("<s>", "a")] == (2, 2, 2)  # vocab {a, b}
    assert m[("a", "b")] == (3, 3, 2)
    assert m[("b", "a")] == (1, 1, 2)


def test_lm_self_scoring_prefers_repetition(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_bigrams, r.avg_nll)
           for r in score_documents(df, alpha=0.1).collect()}
    assert got[1][0] == 6 and got[2][0] == 6
    # the repetitive doc is far more predictable under the corpus model
    assert got[1][1] < got[2][1]


def test_lm_unseen_context_floor(spark):
    train = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    model = train_bigram_lm(train)
    test = spark.createDataFrame([(9, "z q")], ["doc_id", "text"])
    row = score_documents(test, model, alpha=0.5).collect()[0]
    # (<s>, z): known ctx (c=1), unseen bigram -> p = 0.5/(1+0.5*2) = 1/4
    # (z, q): unknown ctx -> p = 0.5/(0.5*2) = 1/2
    exp = (math.log(4.0) + math.log(2.0)) / 2
    assert row.avg_nll == pytest.approx(round(exp, 4))
