"""Round-12 composition wave: dataset cards, the shared-shingle dedup
report, and the counts-native drift folds behind the streaming twins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "web", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "web", "en"),
        (3, "ein kleiner text ueber nichts besonderes hier", "books", "de"),
        (4, "completely different content about spark engines", "web", "en"),
        (5, "", "books", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")


def test_dataset_card_counts_and_ratios(spark):
    from gofast_spark.text.analysis import dataset_card

    row = dataset_card(_docs_df(spark)).collect()[0]
    assert row.n_docs == 5
    assert row.n_sources == 2
    assert row.n_langs == 2
    # docs 1/2 identical -> 4 distinct normalized texts ('' included)
    assert row.n_exact_unique == 4
    assert row.exact_dup_ratio == pytest.approx(1 / 5)
    # tokens: 9 + 9 + 7 + 6 (empty doc contributes 0)
    assert row.n_tokens == 31
    assert row.mean_tokens == pytest.approx(31 / 5)
    assert row.ttr == pytest.approx(row.n_types / 31)
    # language mix: en=3, de=2 over N=5
    exp = sum(
        math.floor(-(n / 5) * math.log(n / 5) * 1e6 + 0.5) for n in (3, 2)
    )
    assert row.lang_entropy_u6 == exp


def test_dataset_card_by_group_per_source(spark):
    from gofast_spark.text.analysis import dataset_card_by_group

    out = {
        r.group: r
        for r in dataset_card_by_group(_docs_df(spark), "source").collect()
    }
    web, books = out["web"], out["books"]
    assert web.n_docs == 3 and books.n_docs == 2
    assert web.n_exact_unique == 2  # the duplicated pair collapses
    assert web.exact_dup_ratio == pytest.approx(1 / 3)
    assert books.n_tokens == 7  # empty doc contributes 0 tokens
    assert books.exact_dup_ratio == pytest.approx(0.0)
    # group with only the empty doc: ttr must be NULL, not a crash
    from pyspark.sql import Row

    lone = dataset_card_by_group(
        _docs_df(spark).sparkSession.createDataFrame(
            [Row(doc_id=9, text="", source="s", lang="en")]
        ),
        "source",
    ).collect()[0]
    assert lone.n_tokens == 0 and lone.ttr is None


def test_ngram_dedup_report_matches_pair_functions(spark):
    from gofast_spark.dedup.ngram import (
        ngram_containment_pairs,
        ngram_dedup_report,
        ngram_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " lambda mu"),
        (2, base + " lambda nu"),          # near-dup of 1 (high jaccard)
        (3, "alpha beta gamma delta epsilon"),  # contained in 1 and 2
        (4, "totally unrelated words here about other things"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = ngram_dedup_report(
        df, "doc_id", "text",
        jaccard_threshold=0.5, containment_threshold=0.9, max_df=None,
    ).collect()[0]
    jp = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.5, max_df=None
    ).count()
    cp = ngram_containment_pairs(
        df, "doc_id", "text", threshold=0.9, max_df=None
    ).count()
    assert rep.n_docs == 4
    assert rep.n_jaccard_pairs == jp and jp >= 1
    assert rep.n_containment_pairs == cp and cp >= 2
    assert rep.n_docs_flagged == 3  # docs 1, 2, 3; doc 4 untouched
    assert rep.n_candidate_pairs >= max(jp, cp)


def test_drift_from_counts_equals_raw_path(spark):
    """The counts-native folds the streaming twins drain into must be
    plan-equivalent to the raw-row batch entry points."""
    from gofast_spark.quality.drift import (
        _group_bin_counts,
        ks_by_group,
        ks_by_group_from_counts,
        psi_by_group,
        psi_by_group_from_counts,
    )

    df = spark.range(400).select(
        (F.col("id") % 4).cast("string").alias("g"),
        ((F.col("id") * 37) % 100).cast("double").alias("v"),
    )
    counts = _group_bin_counts(df, "g", "v", 0.0, 10.0, 10)
    a = sorted(map(tuple, psi_by_group(df, "g", "v", lo=0.0, hi=100.0, bins=10).collect()))
    b = sorted(map(tuple, psi_by_group_from_counts(counts, bins=10).collect()))
    assert a == b
    c = sorted(map(tuple, ks_by_group(df, "g", "v", lo=0.0, hi=100.0, bins=10).collect()))
    d = sorted(map(tuple, ks_by_group_from_counts(counts, bins=10).collect()))
    assert c == d
