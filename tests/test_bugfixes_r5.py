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


def test_events_loader_preserves_session_timezone(spark):
    """Loading the (NTZ-encoded) events table must not mutate the
    session timezone as a side effect."""
    from gofast_spark.plans.catalog import _t

    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = _t(spark, "/root/testdata/sf0.001", "events")
        df.limit(3).collect()
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        )
        # and the reinterpretation is still UTC-correct despite the TZ
        import duckdb

        got = sorted(
            r["u"]
            for r in df.orderBy("event_id")
            .limit(5)
            .select(F.unix_micros("ts").alias("u"))
            .collect()
        )
        want = sorted(
            r[0]
            for r in duckdb.sql(
                "SELECT epoch_us(ts) FROM "
                "read_parquet('/root/testdata/sf0.001/events.parquet') "
                "ORDER BY event_id LIMIT 5"
            ).fetchall()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)


def test_read_event_stream_empty_dir(spark, tmp_path):
    """A stream over an initially-empty directory must start (declared
    fallback schema), like any declared-schema file stream."""
    from gofast_spark.streaming import read_event_stream, run_available_now

    empty = tmp_path / "incoming"
    empty.mkdir()
    stream = read_event_stream(spark, str(empty))
    out = run_available_now(
        stream.groupBy("event_type").count(), mode="complete"
    )
    assert out.count() == 0


def test_update_backslash_escaped_quote(spark):
    from gofast_spark.sql import DBAnalysis

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "note"])
    dba = DBAnalysis(spark).fit({"t_r5c": df})
    dba.manipulate("UPDATE t_r5c SET note = 'it\\'s WHERE x' WHERE id = 1")
    rows = {r["id"]: r["note"] for r in spark.table("t_r5c").collect()}
    assert rows == {1: "it's WHERE x", 2: "b"}


def test_minhash_merge_fragments(spark):
    """A doc id spanning two rows: merge_fragments unions the shingle
    sets so the id gets ONE signature and deduplicated pairs."""
    from gofast_spark.dedup import near_dup_pairs

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (1, text), (2, text)], ["doc_id", "text"]
    )
    out = near_dup_pairs(
        df, "doc_id", "text", threshold=0.8, merge_fragments=True
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert pairs == {(1, 2)}
    assert len(out) == 1  # no fragment-level duplicates


def test_gradient_descent_empty_input_raises(spark):
    import pytest as _pytest

    from gofast_spark.ml import gradient_descent

    df = spark.createDataFrame([], "z double, s double")
    with _pytest.raises(ValueError, match="no rows"):
        gradient_descent(df, "z", "s")


def test_linkage_tie_break_smallest_ids(spark):
    """Equidistant merge candidates resolve to the smallest cluster-id
    pair (the documented deterministic tie-break)."""
    from gofast_spark.ml import linkage_matrix

    # four collinear points with two equal-distance pairs (0,1) and (2,3)
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (10.0,), (11.0,)], ["x"]
    )
    merges = linkage_matrix(df, ["x"], method="single")
    # leaf ids follow the seeded-hash sample order, so assert the
    # order-independent consequences of the smallest-id tie-break:
    # every leaf has a d=1 partner, so the first merge must include
    # cluster id 0, and both first merges happen at d=1
    assert merges[0][0] == 0 and merges[0][2] == 1.0
    assert merges[1][2] == 1.0
    # deterministic: identical output across calls
    assert merges == linkage_matrix(df, ["x"], method="single")
