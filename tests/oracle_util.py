"""Differential-check helper: run a catalog query on Spark and its oracle
SQL on DuckDB over the same parquet, compare row count + order-insensitive
values (the driver's t2 gate, approximated locally)."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Preserve the IEEE sign bit on zero: the driver's hash distinguishes
        # -0.0 from +0.0 (r2 cyclical_month_orders failure) — the local gate
        # must be at least as strict so local green predicts driver green.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full-precision repr (r8 verdict ask #3): the driver hashes raw
        # values, so a 6-sig-digit local gate let sub-1e-6 engine/oracle
        # divergences (funnel_latencies_events's fractional-epoch oracle)
        # pass locally and fail the driver.  Strict local gate = local
        # green predicts driver green.
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def normalize_rows(columns, rows):
    """Sort columns by name, stringify cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["|".join(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [columns[i] for i in order]


def compare(spark, name, sf_dir, query_fn, sql):
    sdf = query_fn(spark, sf_dir)
    s_rows = sdf.collect()
    s_cols = sdf.columns
    con = duck_conn(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    s_norm, s_colnames = normalize_rows(s_cols, [tuple(r) for r in s_rows])
    d_norm, d_colnames = normalize_rows(d_cols, d_rows)

    assert s_colnames == d_colnames, (
        f"{name}: column mismatch spark={s_colnames} duck={d_colnames}"
    )
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count mismatch spark={len(s_norm)} duck={len(d_norm)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} row mismatches; first: "
        f"spark={s_norm[mism[0]]!r} duck={d_norm[mism[0]]!r} cols={s_colnames}"
    )
