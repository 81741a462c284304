"""Rule-based quality control + heuristic data advice (SURVEY §2.8).

Reference: ``quality_control`` (gofast/dataops/quality.py:4813-5100),
``data_assistant`` (gofast/dataops/quality.py:1258).  Both reduce to one
aggregation pass producing a small report frame — the report side-channel
pattern (SURVEY §7.3.3).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_control(
    df: DataFrame,
    rules: dict[str, dict[str, Any]],
) -> DataFrame:
    """Evaluate per-column rules; output (column, rule, n_violations, ok).

    Supported rules per column: ``not_null`` (bool), ``min``/``max``
    (numeric bounds), ``pattern`` (full-match regex for strings),
    ``allowed`` (value whitelist).  All rules for all columns evaluate in
    ONE aggregation pass.
    """
    aggs = []
    labels: list[tuple[str, str]] = []
    for col, spec in rules.items():
        c = F.col(col)
        if spec.get("not_null"):
            aggs.append(F.sum(c.isNull().cast("long")))
            labels.append((col, "not_null"))
        if "min" in spec:
            aggs.append(F.sum((c < spec["min"]).cast("long")))
            labels.append((col, "min"))
        if "max" in spec:
            aggs.append(F.sum((c > spec["max"]).cast("long")))
            labels.append((col, "max"))
        if "pattern" in spec:
            aggs.append(
                F.sum((~c.rlike(f"^{spec['pattern']}$")).cast("long"))
            )
            labels.append((col, "pattern"))
        if "allowed" in spec:
            aggs.append(F.sum((~c.isin(list(spec["allowed"]))).cast("long")))
            labels.append((col, "allowed"))
    named = [a.alias(f"__r_{i}") for i, a in enumerate(aggs)]
    row = df.agg(*named)
    stacked = [
        F.struct(
            F.lit(col).alias("column"),
            F.lit(rule).alias("rule"),
            F.coalesce(F.col(f"__r_{i}"), F.lit(0)).cast("bigint").alias("n_violations"),
            (F.coalesce(F.col(f"__r_{i}"), F.lit(0)) == 0).alias("ok"),
        )
        for i, (col, rule) in enumerate(labels)
    ]
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


def data_assistant(df: DataFrame) -> DataFrame:
    """Heuristic per-column advice: flags high missingness, constant
    columns, id-like columns, and heavy skew; output (column, issue,
    detail).  One profile aggregation, driver-side heuristics over the
    reduced row (data_assistant, gofast/dataops/quality.py:1258)."""
    num = [c for c, t in df.dtypes if t in ("double", "float", "int", "bigint")]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__m_{c}"),
            F.approx_count_distinct(F.col(c)).alias(f"__d_{c}"),
        ]
    for c in num:
        aggs.append(F.skewness(F.col(c)).alias(f"__s_{c}"))
    row = df.agg(*aggs).first()
    n = row["__n"] or 1
    advice: list[tuple[str, str, str]] = []
    for c in df.columns:
        miss = (row[f"__m_{c}"] or 0) / n
        dist = row[f"__d_{c}"] or 0
        if miss > 0.3:
            advice.append(
                (c, "high_missingness", f"{miss:.0%} missing; consider drop or impute")
            )
        if dist <= 1:
            advice.append((c, "constant", "single value; carries no signal"))
        elif dist / n > 0.95 and n > 10:
            advice.append((c, "id_like", "near-unique; exclude from features"))
        if c in num:
            sk = row[f"__s_{c}"]
            if sk is not None and abs(sk) > 2:
                advice.append(
                    (c, "skewed", f"skewness {sk:.2f}; consider log/box-cox")
                )
    spark = df.sparkSession
    return spark.createDataFrame(
        advice or [("__none__", "ok", "no issues detected")],
        "column string, issue string, detail string",
    )
