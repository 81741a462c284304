"""Fixed-grid histogram sketches (functions/sketches.py): merge
exactness and the one-bin quantile error bound."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

LO, HI, BINS = 0.0, 64.0, 16
WIDTH = (HI - LO) / BINS  # 4.0


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", f"d{i % 5}", rng.uniform(0.0, 64.0)) for i in range(600)
    ]
    # out-of-range values must clamp into edge bins, not crash or drop
    rows += [("g0", "d0", -3.0), ("g1", "d1", 99.0)]
    return rows, spark.createDataFrame(rows, ["grp", "day", "v"])


def test_rollup_equals_direct(data):
    from gofast_spark.functions.sketches import (
        histogram_rollup,
        value_histogram,
    )

    rows, df = data
    fine = value_histogram(df, ["grp", "day"], "v", lo=LO, hi=HI, bins=BINS)
    merged = {
        (r["grp"], r["bin"]): r["cnt"]
        for r in histogram_rollup(fine, ["grp"]).collect()
    }
    direct = {
        (r["grp"], r["bin"]): r["cnt"]
        for r in value_histogram(
            df, ["grp"], "v", lo=LO, hi=HI, bins=BINS
        ).collect()
    }
    assert merged == direct
    assert sum(merged.values()) == len(rows)


def test_quantile_within_one_bin(data):
    from gofast_spark.functions.sketches import (
        histogram_quantile,
        value_histogram,
    )

    rows, df = data
    hist = value_histogram(df, ["grp"], "v", lo=LO, hi=HI, bins=BINS)
    est = {
        (r["grp"], r["q"]): r["est"]
        for r in histogram_quantile(
            hist, ["grp"], [0.25, 0.5, 0.9], lo=LO, hi=HI, bins=BINS
        ).collect()
    }
    by_grp: dict[str, list[float]] = {}
    for g, _, v in rows:
        by_grp.setdefault(g, []).append(min(max(v, LO), HI - 1e-9))
    for (g, q), e in est.items():
        vals = sorted(by_grp[g])
        true_q = vals[min(len(vals) - 1, math.ceil(q * len(vals)) - 1)]
        assert true_q <= e <= true_q + WIDTH + 1e-9, (g, q, true_q, e)


def test_nulls_dropped(spark):
    from gofast_spark.functions.sketches import value_histogram

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0)], ["grp", "v"]
    )
    total = (
        value_histogram(df, ["grp"], "v", lo=0.0, hi=8.0, bins=4)
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert total == 2
