"""Deterministic mixture sampling (operators/mixture.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gofast_spark.operators import mixture_rates, mixture_sample


def _corpus(spark, n=400):
    rows = [(i, "web" if i % 2 == 0 else "books") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_rate_one_identity_and_epoch_zero(spark):
    d = _corpus(spark)
    out = mixture_sample(d, "source", {"web": 1.0, "books": 1.0}, "doc_id")
    rows = out.collect()
    assert len(rows) == 400
    assert {r["epoch"] for r in rows} == {0}
    assert out.columns == ["doc_id", "source", "epoch"]


def test_subsample_rate_concentrates(spark):
    d = _corpus(spark)
    out = mixture_sample(d, "source", {"web": 0.5, "books": 0.0}, "doc_id")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "books" not in counts  # rate 0 drops everything
    # 200 web docs at rate 0.5: binomial concentration, generous bounds
    assert 60 <= counts["web"] <= 140


def test_epoch_replication(spark):
    d = _corpus(spark)
    out = mixture_sample(d, "source", {"web": 2.0, "books": 3.5}, "doc_id")
    per = out.groupBy("source", "doc_id").agg(F.count("*").alias("n"))
    web = per.where("source = 'web'").select("n").distinct().collect()
    assert {r["n"] for r in web} == {2}  # integer rate: exactly 2 epochs each
    books = [r["n"] for r in per.where("source = 'books'").collect()]
    assert set(books) <= {3, 4}
    frac4 = sum(1 for n in books if n == 4) / len(books)
    assert 0.3 < frac4 < 0.7  # frac(3.5)=0.5 of docs get the 4th epoch
    # epochs are 0..n-1 per doc
    eps = out.where("source = 'web'").groupBy("doc_id").agg(
        F.collect_set("epoch").alias("e")).first()["e"]
    assert sorted(eps) == [0, 1]


def test_determinism_and_seed_sensitivity(spark):
    d = _corpus(spark)
    a = sorted(map(tuple, mixture_sample(
        d, "source", {"web": 0.5}, "doc_id", seed=1).collect()))
    b = sorted(map(tuple, mixture_sample(
        d, "source", {"web": 0.5}, "doc_id", seed=1).collect()))
    c = sorted(map(tuple, mixture_sample(
        d, "source", {"web": 0.5}, "doc_id", seed=2).collect()))
    assert a == b
    assert a != c


def test_default_rate_applies_to_unlisted(spark):
    d = _corpus(spark)
    out = mixture_sample(
        d, "source", {"web": 1.0}, "doc_id", default_rate=0.0
    )
    assert out.where("source = 'books'").count() == 0
    assert out.where("source = 'web'").count() == 200


def test_negative_rate_raises(spark):
    with pytest.raises(ValueError):
        mixture_sample(_corpus(spark), "source", {"web": -0.1}, "doc_id")


def test_mixture_rates_plan(spark):
    d = _corpus(spark).withColumn("n_tokens", F.lit(10))
    # 50/50 target over a 2000-token budget: web has 2000 tokens avail
    # -> rate 0.5; books 2000 avail -> rate 0.5
    r = mixture_rates(
        d, "source", "n_tokens", {"web": 1.0, "books": 1.0}, budget=2000
    )
    rows = {x["source"]: x for x in r.collect()}
    assert rows["web"]["available"] == 2000
    assert abs(rows["web"]["rate"] - 0.5) < 1e-9
    assert abs(rows["books"]["target_weight"] - 1000.0) < 1e-9
    # rates frame feeds mixture_sample directly
    out = mixture_sample(d, "source", r.withColumnRenamed("source", "source"),
                         "doc_id")
    assert 100 <= out.count() <= 300


def test_corpus_never_shuffles(spark):
    from tests.test_plans import _plan

    d = _corpus(spark)
    plan = _plan(mixture_sample(d, "source", {"web": 0.5}, "doc_id"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # no aggregate/sort over the corpus anywhere
    assert "SortMergeJoin" not in plan
