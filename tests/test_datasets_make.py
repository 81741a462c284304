"""Synthetic generator family (reference gofast/datasets/make.py) —
schema, determinism, and distribution sanity.  All generators are
spark.range + column expressions: fully distributed, no driver arrays."""

from __future__ import annotations


def test_make_data_task_switch(spark):
    from gofast_spark.sources import make_data

    clf = make_data(spark, 200, 4, task="classification", n_classes=3)
    assert "label" in clf.columns
    assert clf.select("label").distinct().count() == 3
    reg = make_data(spark, 200, 4, task="regression")
    assert "y" in reg.columns
    assert reg.count() == 200


def test_make_financial_market_trends(spark):
    from gofast_spark.sources import make_financial_market_trends

    df = make_financial_market_trends(spark, 300, seed=7)
    assert df.count() == 300
    cols = set(df.columns)
    assert {
        "time", "price", "price_trend", "daily_return",
        "moving_average", "price_volatility", "upper_band", "lower_band",
    } <= cols
    row = df.orderBy("t").limit(1).collect()[0]
    assert row["daily_return"] is None  # no prior day
    stats = df.selectExpr(
        "avg(price) p", "avg(upper_band - lower_band) band"
    ).collect()[0]
    assert 90 < stats["p"] < 130
    assert stats["band"] > 0


def test_make_financial_symbols_partition(spark):
    from gofast_spark.sources import make_financial_market_trends

    df = make_financial_market_trends(spark, 50, n_symbols=4, seed=1)
    assert df.count() == 200
    assert df.select("symbol").distinct().count() == 4
    # each symbol starts its own window: 4 null first-returns
    assert df.filter("daily_return IS NULL").count() == 4


def test_make_medical_diagnosis(spark):
    from gofast_spark.sources import make_medical_diagnosis

    df = make_medical_diagnosis(spark, 500, seed=3)
    assert df.count() == 500
    s = df.selectExpr(
        "min(age) a0", "max(age) a1", "avg(systolic) sys",
        "avg(bmi) bmi", "avg(history_of_diabetes) hd",
    ).collect()[0]
    assert 18 <= s["a0"] and s["a1"] <= 90
    assert 110 < s["sys"] < 130
    assert 15 < s["bmi"] < 40
    assert 0.0 < s["hd"] < 0.3
    assert df.select("gender").distinct().count() == 2


def test_make_retail_and_gadget_and_water(spark):
    from gofast_spark.sources import (
        make_gadget_sales,
        make_retail_store,
        make_water_demand,
    )

    r = make_retail_store(spark, 400)
    assert r.select("preferred_category").distinct().count() == 5
    assert r.filter("likely_to_respond NOT IN (0, 1)").count() == 0

    g = make_gadget_sales(spark, 300)
    assert g.select("gadget").distinct().count() == 5
    assert g.filter("age < 12 OR age > 19").count() == 0

    w = make_water_demand(spark, 250)
    bad = w.filter(
        "abs(total_demand - (agricultural_demand + industrial_demand"
        " + domestic_demand)) > 0.01"
    )
    assert bad.count() == 0


def test_generators_deterministic(spark):
    from gofast_spark.sources import make_medical_diagnosis

    a = make_medical_diagnosis(spark, 100, seed=9).collect()
    b = make_medical_diagnosis(spark, 100, seed=9).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_full_generator_registry(spark):
    """Every make_* family member generates, is deterministic in schema,
    and the load_dataset registry resolves all names."""
    from gofast_spark.sources import load_dataset

    names = [
        "regression", "classification", "sales", "retail", "market",
        "medical_diagnosis", "gadget_sales", "water_demand", "social_media",
        "african_demo", "agronomy", "mining_ops", "sounding", "well_logging",
        "ert", "tem", "erp", "elogging", "cc_factors", "system_dynamics",
        "drill_ops",
    ]
    for name in names:
        df = load_dataset(spark, name)
        assert df.count() > 0, name
        assert len(df.columns) >= 3, name


def test_registry_unknown_raises(spark):
    import pytest

    from gofast_spark.sources import load_dataset

    with pytest.raises(KeyError):
        load_dataset(spark, "no_such_dataset")


def test_named_load_datasets(spark):
    """The load_* registry tail (gofast/datasets/load.py:38-1791):
    deterministic, schema-stable, distributed generators."""
    from gofast_spark.sources.io import load_dataset

    cases = {
        "iris": ({"sepal_length", "petal_width", "target"}, 150),
        "statlog": ({"age", "chol", "thal", "presence"}, 270),
        "dyspnea": ({"respiratory_rate", "dyspnea"}, 1000),
        "hydro_metrics": ({"date", "rainfall", "flow"}, 1000),
        "toc": ({"cal", "rt90", "toc"}, 1000),
        "bagoue": ({"power", "geol", "flow"}, 431),
        "hlogs": ({"strata_name", "resistivity", "k"}, 1000),
        "nansha": ({"drawdown", "land_subsidence"}, 1000),
        "mxs": ({"strata", "k", "kp"}, 1000),
        "forensic": ({"dna_use_terrorism_fight"}, 1000),
        "jrs_bet": ({"winning_numbers", "location"}, 1000),
    }
    for name, (cols, n) in cases.items():
        df = load_dataset(spark, name)
        assert cols <= set(df.columns), name
        assert df.count() == n, name
        # determinism: same name + seed -> same first row
        a = df.orderBy(df.columns[0]).first()
        b = load_dataset(spark, name).orderBy(df.columns[0]).first()
        assert a == b, name
