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


def test_dml_insert_update_delete(spark):
    from gofast_spark.sql import DBAnalysis

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "tag", "v"]
    )
    db = DBAnalysis(spark).fit(df, "t_dml")
    db.manipulate("INSERT INTO t_dml VALUES (4, 'd', 40.0)")
    assert spark.table("t_dml").count() == 4
    db.manipulate("UPDATE t_dml SET v = v * 2 WHERE id <= 2")
    got = {r["id"]: r["v"] for r in spark.table("t_dml").collect()}
    assert got == {1: 20.0, 2: 40.0, 3: 30.0, 4: 40.0}
    db.manipulate("DELETE FROM t_dml WHERE tag = 'b'")
    assert sorted(r["id"] for r in spark.table("t_dml").collect()) == [1, 3, 4]


def test_dml_staged_transaction_commit(spark):
    from gofast_spark.sql import DBAnalysis

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["id", "v"])
    db = DBAnalysis(spark).fit(df, "t_txn")
    db.manipulate("INSERT INTO t_txn VALUES (3, 3.0)", auto_commit=False)
    db.manipulate("DELETE FROM t_txn WHERE id = 1", auto_commit=False)
    # nothing applied yet
    assert spark.table("t_txn").count() == 2
    db.commit()
    assert sorted(r["id"] for r in spark.table("t_txn").collect()) == [2, 3]


def test_insert_select_and_column_subset(spark):
    from gofast_spark.sql import DBAnalysis

    a = spark.createDataFrame([(1, "x", 1.5)], ["id", "tag", "v"])
    b = spark.createDataFrame([(9, "y", 9.5)], ["id", "tag", "v"])
    db = DBAnalysis(spark).fit({"t_a": a, "t_b": b})
    db.manipulate("INSERT INTO t_a SELECT * FROM t_b")
    assert spark.table("t_a").count() == 2
    # column-subset insert NULL-fills the rest
    db.manipulate("INSERT INTO t_a (id) VALUES (100)")
    row = [r for r in spark.table("t_a").collect() if r["id"] == 100][0]
    assert row["tag"] is None and row["v"] is None


def test_procedures_integrity_diagnostics(spark):
    from gofast_spark.sql import DBAnalysis

    df = spark.createDataFrame([(1, 5.0), (2, -1.0)], ["id", "v"])
    db = DBAnalysis(spark).fit(df, "t_diag")
    db.register_procedure(
        "top_v", lambda sp, n: sp.sql(f"SELECT * FROM t_diag ORDER BY v DESC LIMIT {n}")
    )
    out = db.storedProcedures("top_v", [1])
    assert out.collect()[0]["id"] == 1
    # integrity: negative v rows violate
    assert not db.ensureDataIntegrity("SELECT * FROM t_diag WHERE v < 0")
    assert db.ensureDataIntegrity("SELECT * FROM t_diag WHERE v IS NULL")
    res, secs = db.scalabilityPerformance("SELECT count(*) AS n FROM t_diag")
    assert res.collect()[0]["n"] == 2 and secs > 0
    rep = db.compatibilityIntegration()
    assert rep["engine"] == "spark" and "t_diag" in rep["tables"]
    assert "t_diag" in db.inspect
