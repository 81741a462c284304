"""Linear text classifier scoring (text/classifier.py)."""

from __future__ import annotations

import math

import pytest

from gofast_spark.text import linear_text_scores, quality_classifier_filter

W = {"good": 2.0, "bad": -3.0}


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "good good text"),
            (2, "bad text here"),
            (3, "nothing matches at all"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )


def test_count_mode_exact_scores(spark):
    out = linear_text_scores(
        _docs(spark), "doc_id", "text", W, bias=0.5, normalize="count"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["dot"] == pytest.approx(4.0)  # 2 hits of +2
    assert rows[1]["score"] == pytest.approx(1 / (1 + math.exp(-4.5)))
    assert rows[2]["dot"] == pytest.approx(-3.0)
    assert rows[3]["dot"] == pytest.approx(0.0)
    assert rows[3]["score"] == pytest.approx(1 / (1 + math.exp(-0.5)))


def test_tf_mode_divides_by_length(spark):
    out = linear_text_scores(
        _docs(spark), "doc_id", "text", W, normalize="tf"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["dot"] == pytest.approx(4.0 / 3.0)
    assert rows[2]["dot"] == pytest.approx(-1.0)


def test_every_doc_scored_once(spark):
    out = linear_text_scores(_docs(spark), "doc_id", "text", W)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 4]


def test_filter_keeps_high_scores(spark):
    kept = quality_classifier_filter(
        _docs(spark), "doc_id", "text", W, threshold=0.6, normalize="count"
    )
    assert kept.columns == ["doc_id", "text"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [1]


def test_bad_normalize_raises(spark):
    with pytest.raises(ValueError):
        linear_text_scores(_docs(spark), "doc_id", "text", W, normalize="idf")


def test_model_broadcast_no_udf(spark):
    from tests.test_plans import _plan

    plan = _plan(linear_text_scores(_docs(spark), "doc_id", "text", W))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
