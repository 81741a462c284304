"""Property-based invariants for the round-6b operators: randomized
corpora/graphs checked against brute-force Python reference
implementations (hypothesis)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
texts = st.lists(words, min_size=1, max_size=30).map(" ".join)


@given(docs=st.lists(texts, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_chunking_covers_every_token_exactly(spark, docs):
    """Chunks at stride == chunk size (overlap 0) partition the token
    stream: concatenating them in order reproduces the document."""
    from gofast_spark.text.chunking import chunk_documents

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=4, overlap=0).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    for i, text in enumerate(docs):
        got = " ".join(t for _, t in sorted(by_doc[i]))
        assert got == text


@given(docs=st.lists(texts, min_size=2, max_size=6))
@settings(**SETTINGS)
def test_duplicated_spans_match_bruteforce_positions(spark, docs):
    """Every position inside a reported span carries a k-gram (k=3)
    occurring in >= 2 docs, and every such position is covered."""
    from gofast_spark.dedup.spans import duplicated_spans

    k = 3
    toks = [d.split() for d in docs]
    gram_docs: dict[tuple, set] = {}
    for i, tk in enumerate(toks):
        for p in range(len(tk) - k + 1):
            gram_docs.setdefault(tuple(tk[p : p + k]), set()).add(i)
    expected = set()
    for i, tk in enumerate(toks):
        dup_pos = [
            p
            for p in range(len(tk) - k + 1)
            if len(gram_docs[tuple(tk[p : p + k])]) >= 2
        ]
        # same islands rule as the operator: merge while gap <= k
        run: list[int] = []
        for p in dup_pos + [None]:
            if run and (p is None or p - run[-1] > k):
                expected.add((i, run[0], run[-1] + k))
                run = []
            if p is not None:
                run.append(p)
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end_excl)
        for r in duplicated_spans(df, k=k).collect()
    }
    assert got == expected


@given(
    dim_keys=st.sets(st.integers(min_value=0, max_value=10**6),
                     min_size=1, max_size=40),
    probe_keys=st.sets(st.integers(min_value=0, max_value=10**6),
                       min_size=1, max_size=60),
)
@settings(**SETTINGS)
def test_bloom_never_false_negative(spark, dim_keys, probe_keys):
    from gofast_spark.operators.bloom import bloom_build, bloom_might_contain

    dim = spark.createDataFrame([(k,) for k in dim_keys], "k bigint")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k bigint")
    bm = bloom_build(dim, "k", n_bits=1024, k=3)
    passed = {
        r.k for r in probe.where(bloom_might_contain("k", bm, k=3)).collect()
    }
    assert dim_keys & probe_keys <= passed


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_pagerank_matches_numpy_power_iteration(spark, edges):
    """Spark PageRank equals a dense numpy power iteration on the same
    symmetrized graph (both start uniform, 4 iterations)."""
    import numpy as np

    from gofast_spark.ml.graph import edges_from_pairs, pagerank

    pairs = spark.createDataFrame(list(edges), ["a", "b"])
    e = edges_from_pairs(pairs, "a", "b", undirected=True)
    got = {r.node: r.rank for r in pagerank(e, iterations=4).collect()}

    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = sorted({x for p in sym for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0] * n
    for a, _ in sym:
        out[idx[a]] += 1
    r = [1.0 / n] * n
    for _ in range(4):
        inc = [0.0] * n
        for a, b in sym:
            inc[idx[b]] += r[idx[a]] / out[idx[a]]
        r = [0.15 / n + 0.85 * inc[i] for i in range(n)]
    for node, i in idx.items():
        assert math.isclose(got[node], r[i], rel_tol=1e-9, abs_tol=1e-12)


@given(docs=st.lists(texts, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_bigram_lm_nll_is_proper(spark, docs):
    """avg_nll is finite and non-negative, and n_bigrams equals the doc
    token count (BOS conditions the first token)."""
    from gofast_spark.text.lm import score_documents

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    for r in score_documents(df).collect():
        assert r.n_bigrams == len(docs[r.doc_id].split())
        assert r.avg_nll >= 0.0 and math.isfinite(r.avg_nll)
