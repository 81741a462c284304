"""Unit tests: exact set-similarity join with prefix filtering."""

from __future__ import annotations

import itertools

import pytest


def _brute(docs, t):
    toks = {i: set(s.lower().split()) for i, s in docs}
    out = {}
    for (i, _), (j, _) in itertools.combinations(docs, 2):
        a, b = toks[i], toks[j]
        inter = len(a & b)
        union = len(a | b)
        if union and inter / union >= t - 1e-12:
            out[(min(i, j), max(i, j))] = (inter, union)
    return out


def test_setsim_matches_brute_force(spark):
    from gofast_spark.dedup.setsim import set_similarity_join

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over a lazy dog"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "completely different content about spark engines"),
        (5, "completely different content about spark engines today"),
        (6, "unrelated text"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    for t in (0.5, 0.7, 0.9):
        got = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
            for r in set_similarity_join(
                df, "doc_id", "text", threshold=t
            ).collect()
        }
        assert got == _brute(docs, t), f"threshold {t}"


def test_setsim_random_property(spark):
    from gofast_spark.dedup.setsim import set_similarity_join

    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.sample(vocab, rng.randint(5, 15))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in set_similarity_join(
            df, "doc_id", "text", threshold=0.4
        ).collect()
    }
    assert got == set(_brute(docs, 0.4))


def test_setsim_exact_boundary_included(spark):
    from gofast_spark.dedup.setsim import set_similarity_join

    # J = 3/4 = 0.75 exactly: must be INCLUDED at threshold 0.75
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d")], "doc_id int, text string"
    )
    rows = set_similarity_join(df, "doc_id", "text", threshold=0.75).collect()
    assert len(rows) == 1
    assert (rows[0]["n_inter"], rows[0]["n_union"]) == (3, 4)
    # and EXCLUDED just above
    assert not set_similarity_join(
        df, "doc_id", "text", threshold=0.7501
    ).collect()


def test_setsim_validates_threshold(spark):
    from gofast_spark.dedup.setsim import set_similarity_join

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        set_similarity_join(df, "doc_id", "text", threshold=0.0)
