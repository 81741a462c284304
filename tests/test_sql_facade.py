"""DBAnalysis facade behavior: fit requirement, intent validation,
return types (reference gofast/query.py:115-695 contract)."""

from __future__ import annotations

import pytest


def test_facade_requires_fit(spark):
    from gofast_spark.sql import DBAnalysis
    from gofast_spark.sql.dbanalysis import NotFittedError

    with pytest.raises(NotFittedError):
        DBAnalysis(spark).query("SELECT 1")


def test_facade_intent_validation(spark):
    from gofast_spark.sql import DBAnalysis

    db = DBAnalysis(spark).fit(spark.range(3), "t_small")
    with pytest.raises(ValueError, match="aggregation"):
        db.aggregate("SELECT id FROM t_small")
    with pytest.raises(ValueError, match="join"):
        db.joinTables("SELECT id FROM t_small")
    with pytest.raises(ValueError, match="window"):
        db.windowFunctions("SELECT id FROM t_small")
    with pytest.raises(ValueError, match="return_type"):
        db.query("SELECT id FROM t_small", return_type="list")


def test_facade_query_and_raw(spark):
    from gofast_spark.sql import DBAnalysis

    db = DBAnalysis(spark).fit(spark.range(5), "t_range")
    df = db.aggregate("SELECT COUNT(*) AS n FROM t_range")
    assert df.collect()[0]["n"] == 5
    raw = db.query("SELECT id FROM t_range WHERE id < 2", return_type="raw")
    assert sorted(r["id"] for r in raw) == [0, 1]
    res = db.subqueriesAndTempTables(
        "WITH big AS (SELECT id FROM t_range WHERE id >= 3) SELECT COUNT(*) AS n FROM big"
    )
    assert res.collect()[0]["n"] == 2
