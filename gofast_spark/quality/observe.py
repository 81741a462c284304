"""Single-pass quality reports via Spark metric observation.

The reference's quality ops all return ``(df, report)`` tuples computed
eagerly over the (in-memory) frame (``audit_data``
gofast/dataops/quality.py:98-325; ``verify_data_integrity``:1709 —
every report a fresh pandas pass).  On a distributed engine a separate
report pass means re-scanning the table; SURVEY §7.3.3's answer is the
``df.observe`` accumulator: metrics are attached to the SAME job that
materializes the frame, collected as accumulators while the rows flow —
a 100-TB quality report for the cost of zero extra scans.

Contract: observed metrics materialize when an ACTION runs on the
returned frame (write, count, collect); reading them before any action
raises.  Metrics must be aggregate expressions without distinct (Spark
observation restriction) — null/NaN/range/row counts, sums, means.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    cols: Sequence[str],
    *,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach a quality observation to ``df``: total rows plus per
    -column null counts and min/max, riding the next action's scan.

    Returns ``(observed_df, observation)`` — run any action on
    ``observed_df``, then read ``observation.get`` (a dict) or convert
    with :func:`quality_report_frame`."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        metrics.append(
            F.sum(col.isNull().cast("bigint")).alias(f"{c}__nulls")
        )
        metrics.append(F.min(col).alias(f"{c}__min"))
        metrics.append(F.max(col).alias(f"{c}__max"))
    return df.observe(obs, *metrics), obs


def quality_report_frame(df: DataFrame, obs: Observation) -> DataFrame:
    """Fold an activated observation into a per-column report frame
    ``(column, n_rows, n_nulls, null_ratio, min_str, max_str)`` —
    bounded driver data (one dict), presented back as a DataFrame so
    reports compose with the rest of the catalog."""
    m = obs.get  # raises if no action has run yet
    n = int(m["n_rows"])
    cols = sorted(
        {k.rsplit("__", 1)[0] for k in m if k.endswith("__nulls")}
    )
    rows = []
    for c in cols:
        nulls = int(m[f"{c}__nulls"])
        rows.append(
            (
                c,
                n,
                nulls,
                float(nulls) / n if n else 0.0,
                None if m[f"{c}__min"] is None else str(m[f"{c}__min"]),
                None if m[f"{c}__max"] is None else str(m[f"{c}__max"]),
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows bigint, n_nulls bigint, "
        "null_ratio double, min_str string, max_str string",
    )


def quality_report_numeric(
    df: DataFrame,
    obs: Observation,
    *,
    unit: int = 1_000_000,
) -> DataFrame:
    """Exact-integer presentation of the observed quality report for
    NUMERIC columns: ``(column, n_rows, n_nulls, null_ppm, min_u6,
    max_u6)`` with ``null_ppm = floor(unit * n_nulls / n_rows)`` and
    min/max quantized to micro-units ``floor(v * unit + 0.5)``.

    Every cell is an integer, so the report hashes identically across
    engines regardless of float-rendering conventions — the
    differential-testing presentation (:func:`quality_report_frame`
    keeps the human-readable string form).

    ``null_ppm`` is pure integer arithmetic ``(unit * n_nulls) // n`` —
    never a double division — so the value is exact even when
    ``unit * n_nulls`` exceeds 2**53 (a float path can be 1 ulp off
    there and flip the floor)."""
    rows = observed_numeric_rows(obs, unit=unit)
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows bigint, n_nulls bigint, "
        "null_ppm bigint, min_u6 bigint, max_u6 bigint",
    )


def observed_numeric_rows(
    obs: Observation, *, unit: int = 1_000_000
) -> list[tuple]:
    """The exact-integer report rows harvested from an activated
    observation, as plain Python tuples sorted by column name —
    the comparison side of :func:`quality_report_relational`'s
    observation-vs-aggregate equivalence check."""
    import math

    m = obs.get  # raises if no action has run yet
    n = int(m["n_rows"])
    cols = sorted(
        {k.rsplit("__", 1)[0] for k in m if k.endswith("__nulls")}
    )

    def _q(v):
        return None if v is None else int(math.floor(float(v) * unit + 0.5))

    rows = []
    for c in cols:
        nulls = int(m[f"{c}__nulls"])
        rows.append(
            (
                c,
                n,
                nulls,
                (unit * nulls) // n if n else 0,
                _q(m[f"{c}__min"]),
                _q(m[f"{c}__max"]),
            )
        )
    return rows


def exact_ppm_sql(
    nulls: str = "n_nulls",
    n: str = "n_rows",
    unit: int = 1_000_000,
    dialect: str = "spark",
) -> str:
    """SQL text computing ``floor(unit * nulls / n)`` in EXACT bigint
    arithmetic without overflowing int64.

    A single ``(unit * nulls) DIV n`` overflows (errors under ANSI)
    once ``nulls > 2**63 / unit`` ≈ 9.2e12 for ppm — reachable on a
    multi-trillion-row table.  The unit is therefore split into two
    balanced power-of-10 factors ``u1 * u2`` and the division staged:

        t = u1 * nulls;  q1 = t DIV n;  r1 = t % n
        floor(t * u2 / n) = u2 * q1 + (u2 * r1) DIV n

    (exact because ``t * u2 = u2*q1*n + u2*r1``; all operands
    non-negative, so integer division's truncation is floor).  With
    u1 = u2 = 1000 the intermediates stay under 2**63 for any table
    below ~9.2e15 rows.  The same algebra is emitted for both engines
    — only the integer-division spelling differs (Spark ``DIV``,
    DuckDB ``//``) — so oracles reuse it via ``dialect='duckdb'``."""
    u1, u2 = unit, 1
    while u1 % 10 == 0 and u1 > u2 * 10:
        u1 //= 10
        u2 *= 10
    assert u1 * u2 == unit
    idiv = {"spark": "DIV", "duckdb": "//"}[dialect]
    return (
        f"CAST({u2} * (({u1} * {nulls}) {idiv} {n}) "
        f"+ ({u2} * (({u1} * {nulls}) % {n})) {idiv} {n} AS BIGINT)"
    )


def quality_report_relational(
    df: DataFrame,
    cols: Sequence[str],
    *,
    unit: int = 1_000_000,
) -> DataFrame:
    """The same exact-integer quality report as
    :func:`quality_report_numeric`, but as a COMPUTED relational plan
    (one global aggregate over ``df`` + a ``stack`` unpivot) instead of
    a ``createDataFrame`` of observation literals: one scan, one
    1-row-per-column result, no driver-side literals.

    ``null_ppm`` uses the staged exact integer division of
    :func:`exact_ppm_sql` — overflow-safe bigint arithmetic mirroring
    the pure-integer oracle, never a double conversion."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        # explicit backtick quoting: a raw name with a backtick fails
        # Spark's attribute parser in both F.col and df[...]
        col = F.col("`" + c.replace("`", "``") + "`")
        aggs += [
            F.sum(col.isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.floor(F.min(col) * unit + F.lit(0.5))
            .cast("bigint")
            .alias(f"{c}__min_u"),
            F.floor(F.max(col) * unit + F.lit(0.5))
            .cast("bigint")
            .alias(f"{c}__max_u"),
        ]
    agg = df.agg(*aggs)

    def _ident(name: str) -> str:
        # backtick-quoted identifier: escape embedded backticks
        return "`" + name.replace("`", "``") + "`"

    def _slit(s: str) -> str:
        # single-quoted SQL string literal: escape quotes + backslashes
        return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

    stack_args = ", ".join(
        f"{_slit(c)}, {_ident(c + '__nulls')}, "
        f"{_ident(c + '__min_u')}, {_ident(c + '__max_u')}"
        for c in sorted(cols)
    )
    stacked = agg.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (`column`, n_nulls, min_u6, max_u6)"
        ),
    )
    return stacked.select(
        F.col("column"),
        F.col("n_rows"),
        F.col("n_nulls"),
        F.expr(
            f"CASE WHEN n_rows = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE {exact_ppm_sql('n_nulls', 'n_rows', unit)} END"
        ).alias("null_ppm"),
        "min_u6",
        "max_u6",
    )
