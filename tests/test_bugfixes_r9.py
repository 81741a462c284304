"""Round-9 regression guards: cross-engine float-precision hazard
classes surfaced by the full-precision oracle gate (r8 verdict asks
#2/#3).  These are STATIC guards over the oracle SQL text — they run in
milliseconds and fail the moment a future entry reintroduces a pattern
from a class that has already produced a driver red."""

from __future__ import annotations

import re

import duckdb
import pytest

from gofast_spark.plans.catalog import ORACLE_SQL

_FLOAT_LIT = re.compile(r"\d+\.\d{13,}")


def test_long_float_literals_convert_exactly_in_duckdb():
    """DuckDB parses float literals as DECIMAL and its decimal->double
    conversion is 1 ulp off for SOME 17-digit literals (r9:
    CAST(1.8708286933869707 AS DOUBLE) -> ...709 broke
    variance_ratio_daily).  Every long literal any oracle embeds must
    round-trip to the exact Python double, or the oracle silently
    diverges from the engine by an ulp."""
    lits = sorted(
        {m for sql in ORACLE_SQL.values() for m in _FLOAT_LIT.findall(sql)}
    )
    assert lits, "expected at least one long float literal in the catalog"
    con = duckdb.connect()
    bad = []
    for lit in lits:
        got = con.execute(f"SELECT CAST({lit} AS DOUBLE)").fetchone()[0]
        if got != float(lit):
            bad.append((lit, repr(got)))
    con.close()
    assert not bad, (
        f"oracle float literals that DuckDB converts inexactly "
        f"(use small-integer arithmetic instead): {bad}"
    )


def test_no_fractional_epoch_in_oracles():
    """Spark's unix_timestamp floors to whole seconds; DuckDB's
    epoch(ts) keeps microseconds (every events.ts row has them).  A
    bare epoch() in an oracle therefore diverges from the engine below
    the second (r8 driver red: funnel_latencies_events) — every use
    must be wrapped in floor().

    The check is SYNTACTIC: it only recognizes floor( directly (modulo
    whitespace) around the epoch( call.  An exact-but-differently
    -phrased wrapping (e.g. an outer floor around an epoch difference)
    is still flagged — adjust the oracle to the adjacent-floor form
    rather than weakening this pattern."""
    offenders = []
    for name, sql in ORACLE_SQL.items():
        for m in re.finditer(r"(floor\(\s*)?epoch(_ms|_us)?\(", sql):
            if m.group(1) or m.group(2):
                continue
            offenders.append(name)
            break
    assert not offenders, (
        f"oracles using fractional epoch() without floor(): {offenders}"
    )


@pytest.mark.parametrize(
    "name",
    ["funnel_latencies_events", "observed_report_lineitem",
     "variance_ratio_daily", "diversity_nations_by_segment",
     "cox_ph_events"],
)
def test_r9_fixed_entries_present_exact_values(name):
    """The five entries fixed this round present quantized/exact-integer
    values (no raw transcendental or str()-rendered floats) — the
    columns that diverged are now *_u6/_us/_ppm integer presentations."""
    sql = ORACLE_SQL[name]
    assert re.search(r"_u6|_us|_ppm|floor\(", sql)


def test_random_search_ridge_matches_sweep_and_lcg(spark):
    """random_search_ridge = LCG index draw + the ridge_cv_sweep solve:
    picks must replay the portable LCG exactly, and each trial's rmse
    must equal the plain sweep's rmse for the same lambda."""
    from gofast_spark.ml.selection import (
        _LCG_A,
        _LCG_C,
        _LCG_M,
        random_search_lcg_picks,
        random_search_ridge,
        ridge_cv_sweep,
    )

    s, expect = 11, []
    for _ in range(8):
        s = (_LCG_A * s + _LCG_C) % _LCG_M
        expect.append(s % 16)
    assert random_search_lcg_picks(16, 8, 11) == expect

    rows = [
        (i, float(i % 7), float((i * 3) % 5), 2.0 * (i % 7) - ((i * 3) % 5))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, x1 double, x2 double, y double")
    grid = [0.0, 0.1, 1.0, 10.0]
    got = {
        r["trial"]: (r["lam"], r["mean_rmse"])
        for r in random_search_ridge(
            df, ["x1", "x2"], "y", id_col="id", grid=grid, n_trials=6,
            k=3, seed=11,
        ).collect()
    }
    picks = random_search_lcg_picks(len(grid), 6, 11)
    sweep = {
        r["lam"]: r["mean_rmse"]
        for r in ridge_cv_sweep(
            df, ["x1", "x2"], "y", id_col="id",
            lambdas=sorted({grid[j] for j in picks}), k=3, seed=11,
        ).collect()
    }
    assert set(got) == set(range(6))
    for i in range(6):
        lam, rmse = got[i]
        assert lam == grid[picks[i]]
        assert rmse == sweep[lam]


def test_quality_report_numeric_values(spark):
    """quality_report_numeric: ppm + micro-unit integers from the
    observation dict, nulls counted, None min/max preserved."""
    from gofast_spark.quality.observe import (
        observe_quality,
        quality_report_numeric,
    )

    df = spark.createDataFrame(
        [(1.5, None), (2.25, None), (None, None), (0.5, None)],
        "a double, b double",
    )
    observed, obs = observe_quality(df, ["a", "b"])
    observed.write.format("noop").mode("overwrite").save()
    rows = {r["column"]: r for r in quality_report_numeric(observed, obs).collect()}
    a, b = rows["a"], rows["b"]
    assert a["n_rows"] == 4 and a["n_nulls"] == 1
    assert a["null_ppm"] == 250000
    assert a["min_u6"] == 500000 and a["max_u6"] == 2250000
    assert b["n_nulls"] == 4 and b["min_u6"] is None and b["max_u6"] is None
    assert b["null_ppm"] == 1000000


def test_cap_basket_size_none_and_validation(spark):
    from gofast_spark.ml.itemsets import cap_basket_size

    df = spark.createDataFrame([(1, "a"), (1, "b")], "bk int, it string")
    out, n_dropped = cap_basket_size(df, None)
    assert out is df and n_dropped == 0  # disabled -> untouched plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cap_basket_size(df, 1)


def test_random_search_ridge_validation(spark):
    from gofast_spark.ml.selection import (
        random_search_lcg_picks,
        random_search_ridge,
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        random_search_lcg_picks(0, 3, 1)
    df = spark.createDataFrame([(1, 1.0, 1.0, 1.0)], "id bigint, x1 double, x2 double, y double")
    with _pytest.raises(ValueError):
        random_search_ridge(df, ["x1", "x2"], "y", id_col="id", grid=[1.0], n_trials=0)
    with _pytest.raises(ValueError):
        random_search_ridge(df, ["x1"], "y", id_col="id", grid=[1.0], n_trials=1)
