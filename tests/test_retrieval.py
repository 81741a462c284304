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


def test_hashed_tf_sparse_counts(spark):
    from gofast_spark.text.features import hashed_tf_sparse

    df = spark.createDataFrame(
        [(1, "spark spark join"), (2, "")], ["doc_id", "text"]
    )
    rows = hashed_tf_sparse(df, dim=16).collect()
    got = {(r.doc_id, r.cell): r.tf for r in rows}
    assert sum(v for (d, _), v in got.items() if d == 1) == 3
    assert not any(d == 2 for d, _ in got)  # token-less doc absent


def test_hashed_tf_vector_matches_sparse_and_normalizes(spark):
    import math

    from gofast_spark.text.features import hashed_tf_sparse, hashed_tf_vector

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "z z z")], ["doc_id", "text"]
    )
    sparse = {
        (r.doc_id, r.cell): r.tf
        for r in hashed_tf_sparse(df, dim=8).collect()
    }
    for r in hashed_tf_vector(df, dim=8, normalize=False).collect():
        for i, x in enumerate(r.vec):
            assert x == sparse.get((r.doc_id, i), 0)
    for r in hashed_tf_vector(df, dim=8, normalize=True).collect():
        assert math.isclose(sum(x * x for x in r.vec), 1.0, rel_tol=1e-9)


def test_hashed_vectors_feed_similarity_layer(spark):
    from pyspark.sql import functions as F

    from gofast_spark.sim import cosine_topk
    from gofast_spark.text.features import hashed_tf_vector

    df = spark.createDataFrame(
        [
            (1, "spark join filter"),
            (2, "spark join filter group"),
            (3, "totally different words here"),
        ],
        ["doc_id", "text"],
    )
    vecs = hashed_tf_vector(df, dim=32)
    q = vecs.where(F.col("doc_id") == 1)
    top = cosine_topk(vecs, q, "doc_id", "vec", k=1).collect()[0]
    assert top.doc_id == 2  # the lexical near-copy, not the unrelated doc
