"""Callable agg specs (GROUPED_AGG pandas UDF) and the applyInPandas
bridge (SURVEY 2.13) — no scipy needed."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def events(spark, sf_small):
    return spark.read.parquet(os.path.join(sf_small, "events.parquet")).select(
        "event_type", "value"
    )


def test_callable_agg_and_grouped_apply(spark, events):
    from gofast_spark.operators import group_and_aggregate
    from gofast_spark.operators.aggregations import grouped_apply

    out = group_and_aggregate(
        events, "event_type", {"value": lambda s: s.median()}
    )
    got = {r["event_type"]: r["value_lambda"] for r in out.collect()}
    pdf = events.toPandas()
    for et, med in pdf.groupby("event_type").value.median().items():
        assert abs(got[et] - med) < 1e-9

    def top1(pdf_g):
        return pdf_g.nlargest(1, "value")[["event_type", "value"]]

    top = grouped_apply(events, "event_type", top1, "event_type string, value double")
    assert top.count() == 5
