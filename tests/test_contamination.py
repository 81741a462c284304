"""Benchmark contamination detection (text/contamination.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gofast_spark.text.contamination import contamination_check, decontaminate


def _frames(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown cat sits on the mat"),
            (4, "completely unrelated text about spark plans"),
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a benchmark question about the quick brown fox")],
        "doc_id bigint, text string",
    )
    return corpus, ev


def test_flags_shared_trigrams(spark):
    corpus, ev = _frames(spark)
    out = contamination_check(corpus, ev, "doc_id", "text", k=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # doc 1 shares "the quick brown" / "quick brown fox"; doc 3 shares
    # "the quick brown"; 2 and 4 share nothing
    assert rows[1]["is_contaminated"] == 1 and rows[1]["n_hit"] >= 2
    assert rows[3]["is_contaminated"] == 1 and rows[3]["n_hit"] == 1
    assert rows[2]["is_contaminated"] == 0 and rows[2]["n_hit"] == 0
    assert rows[4]["is_contaminated"] == 0
    for r in rows.values():
        assert 0 <= r["n_hit"] <= r["n_grams"]
        assert abs(r["contamination_frac"] - r["n_hit"] / r["n_grams"]) < 1e-6


def test_threshold_filters_weak_overlap(spark):
    corpus, ev = _frames(spark)
    out = contamination_check(corpus, ev, "doc_id", "text", k=3, threshold=0.2)
    rows = {r["doc_id"]: r["is_contaminated"] for r in out.collect()}
    # doc 3: 1 hit of 7 grams = 0.14 < 0.2 -> clean at this threshold
    assert rows[3] == 0
    # doc 1: 2 hits of 7 grams = 0.29 > 0.2 -> still flagged
    assert rows[1] == 1


def test_decontaminate_preserves_schema_and_drops(spark):
    corpus, ev = _frames(spark)
    clean = decontaminate(corpus, ev, "doc_id", "text", k=3)
    assert clean.columns == corpus.columns
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 4]


def test_short_doc_whole_string_gram(spark):
    corpus = spark.createDataFrame(
        [(1, "hello world"), (2, "other words")], "doc_id bigint, text string"
    )
    ev = spark.createDataFrame([(9, "hello world")], "doc_id bigint, text string")
    out = contamination_check(corpus, ev, "doc_id", "text", k=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["is_contaminated"] == 1 and rows[1]["n_grams"] == 1
    assert rows[2]["is_contaminated"] == 0


def test_eval_grams_broadcast(spark):
    from tests.test_plans import _plan

    corpus, ev = _frames(spark)
    plan = _plan(contamination_check(corpus, ev, "doc_id", "text", k=3))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_source_overlap_known_jaccard(spark):
    from gofast_spark.text.contamination import source_overlap

    # source A and B share exactly one 3-gram ('x y z'); C is disjoint
    df = spark.createDataFrame(
        [
            ("A", "x y z p q"),        # grams: xyz, yzp, zpq
            ("B", "x y z r"),          # grams: xyz, yzr
            ("C", "m n o"),            # gram:  mno
            ("C", "mm"),               # too short -> no grams
        ],
        ["source", "text"],
    )
    rows = {(r["a"], r["b"]): r for r in source_overlap(df, "source", "text").collect()}
    assert set(rows) == {("A", "B")}
    r = rows[("A", "B")]
    assert (r["n_inter"], r["sz_a"], r["sz_b"]) == (1, 3, 2)
    assert abs(r["jaccard"] - 0.25) < 1e-12
