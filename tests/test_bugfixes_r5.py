"""Regressions for the round-5 ADVICE fixes: salted count(col) NULL
semantics, salted_join outer-join refusal, quote-aware DML WHERE split,
merge_frames_on_index suffix escalation, and the explicit
transform_is_expr flag on handle_unique_identifiers."""

from __future__ import annotations

import pytest
from pyspark.sql import Column
from pyspark.sql import functions as F


def test_salted_count_skips_nulls(spark):
    from gofast_spark.operators.skew import salted_group_agg

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)], ["k", "v"]
    )
    out = {
        r["k"]: (r["v_count"], r["n"])
        for r in salted_group_agg(
            df, "k", [("v", "count"), ("*", "count")], salt=4
        ).collect()
    }
    # count(v) must skip NULLs exactly like the unsalted plan
    assert out == {"a": (2, 3), "b": (0, 1)}


def test_salted_join_refuses_right_and_full(spark):
    from gofast_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.createDataFrame([(1, "x"), (99, "y")], ["k", "lbl"])
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", how=how)
    # left join stays supported and NULL-pads unmatched big rows once
    out = salted_join(big, small, "k", how="left", salt=4)
    assert out.count() == 10
    assert out.where(F.col("lbl").isNotNull()).count() == 1


def test_update_where_inside_string_literal(spark):
    from gofast_spark.sql import DBAnalysis

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "note"])
    dba = DBAnalysis(spark).fit({"t_r5": df})
    dba.manipulate("UPDATE t_r5 SET note = 'x WHERE y' WHERE id = 1")
    rows = {r["id"]: r["note"] for r in spark.table("t_r5").collect()}
    assert rows == {1: "x WHERE y", 2: "b"}


def test_update_without_where_and_literal_where_value(spark):
    from gofast_spark.sql import DBAnalysis

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "note"])
    dba = DBAnalysis(spark).fit({"t_r5b": df})
    # no WHERE clause at all: applies to every row, even though the SET
    # value contains the word WHERE in a literal
    dba.manipulate("UPDATE t_r5b SET note = ' WHERE '")
    assert {r["note"] for r in spark.table("t_r5b").collect()} == {" WHERE "}


def test_merge_on_index_suffix_escalates(spark):
    from gofast_spark.operators.joins import merge_frames_on_index

    a = spark.createDataFrame([(1, 10, 11)], ["idx", "x", "x_1"])
    b = spark.createDataFrame([(1, 20)], ["idx", "x"])
    out = merge_frames_on_index(a, b, index_col="idx")
    # frame b's "x" collides; the naive "x_1" suffix also collides with
    # frame a's existing "x_1" column, so it must escalate
    assert len(out.columns) == len(set(out.columns))
    row = out.collect()[0]
    assert row["x"] == 10 and row["x_1"] == 11
    assert 20 in [row[c] for c in out.columns if c not in ("idx", "x", "x_1")]


def test_transform_is_expr_flag(spark):
    from gofast_spark.quality.duplicates import handle_unique_identifiers

    df = spark.createDataFrame([(i, i * 2) for i in range(50)], ["id", "v"])
    # lambda x: x + 1 is ambiguous: valid as Column expr AND as scalar fn.
    # With the explicit scalar flag the pandas_udf path must be used and
    # still produce the right values.
    out_expr = handle_unique_identifiers(
        df, threshold=0.9, action="transform",
        transform_func=lambda x: x + 1, transform_is_expr=True,
    )
    out_scalar = handle_unique_identifiers(
        df, threshold=0.9, action="transform",
        transform_func=lambda x: x + 1, transform_is_expr=False,
    )
    e = sorted(r["id"] for r in out_expr.collect())
    s = sorted(r["id"] for r in out_scalar.collect())
    assert e == s == list(range(1, 51))
    # a non-Column return with transform_is_expr=True is a hard error
    with pytest.raises(TypeError):
        handle_unique_identifiers(
            df, threshold=0.9, action="transform",
            transform_func=lambda x: "nope", transform_is_expr=True,
        )
