"""Differential correctness: every catalog query with an oracle must match
DuckDB at sf0.001 (fast) — the driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from gofast_spark.plans.catalog import ORACLE_SQL, QUERIES
from tests.oracle_util import compare


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_match(spark, sf_small, name):
    compare(spark, name, sf_small, QUERIES[name], ORACLE_SQL[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    assert df.count() >= 0
