"""Composite cleanup + selector/bridge utilities (SURVEY §2.2, §2.13).

Reference: ``sanitize`` (gofast/dataops/transformation.py:372),
``format_long_column_names`` (:486), ``ColumnSelector``/
``DataFrameSelector`` (gofast/transformers/feature_engineering.py:4950,
3158), ``speed_rowwise_process`` (gofast/utils/base_utils.py:3038),
``assess_outlier_impact`` (gofast/dataops/quality.py:887).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sanitize(
    df: DataFrame,
    *,
    fill_missing: str | None = None,
    remove_duplicates: bool = True,
    outlier_method: str | None = None,
    consistency_transform: str | None = None,
    threshold: float = 3.0,
) -> DataFrame:
    """The reference's one-call cleanup composite
    (gofast/dataops/transformation.py:372): optional impute -> dedupe ->
    outlier removal -> string-case normalization, composed into ONE lazy
    plan (stage order preserved for parity, SURVEY §7.3.5)."""
    from gofast_spark.quality import handle_missing_data, handle_outliers_in

    out = df
    if fill_missing in ("mean", "median"):
        out = handle_missing_data(out, f"fill_{fill_missing}")
    if remove_duplicates:
        out = out.dropDuplicates()
    if outlier_method in ("iqr", "zscore"):
        num = [c for c, t in out.dtypes if t in ("double", "float")]
        if num:
            out = handle_outliers_in(
                out, num, method=outlier_method, action="remove", factor=threshold
            )
    if consistency_transform in ("lower", "upper"):
        fn = F.lower if consistency_transform == "lower" else F.upper
        for c, t in out.dtypes:
            if t == "string":
                out = out.withColumn(c, fn(F.col(c)))
    return out


def format_long_column_names(
    df: DataFrame, *, max_length: int = 30, suffix_digits: int = 2
) -> DataFrame:
    """Truncate over-long column names, deduplicating collisions
    (format_long_column_names, gofast/dataops/transformation.py:486)."""
    seen: dict[str, int] = {}
    out_names = []
    for c in df.columns:
        name = c[:max_length]
        if name in seen:
            seen[name] += 1
            name = f"{name[: max_length - suffix_digits]}{seen[name]:0{suffix_digits}d}"
        else:
            seen[name] = 0
        out_names.append(name)
    return df.toDF(*out_names)


class ColumnSelector:
    """sklearn-style column projection transformer (ColumnSelector,
    gofast/transformers/feature_engineering.py:4950): select by explicit
    names and/or a regex over names; ``transform`` is a pure select."""

    def __init__(
        self,
        columns: Sequence[str] | None = None,
        *,
        pattern: str | None = None,
    ):
        self.columns = list(columns) if columns else None
        self.pattern = pattern

    def fit(self, df: DataFrame) -> "ColumnSelector":
        cols = []
        if self.columns:
            missing = [c for c in self.columns if c not in df.columns]
            if missing:
                raise KeyError(f"missing columns: {missing}")
            cols += self.columns
        if self.pattern:
            rx = re.compile(self.pattern)
            cols += [c for c in df.columns if rx.search(c) and c not in cols]
        self.selected_ = cols or list(df.columns)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        return df.select(*self.selected_)

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


class DataFrameSelector(ColumnSelector):
    """Dtype-filtered variant (DataFrameSelector,
    gofast/transformers/feature_engineering.py:3158)."""

    def __init__(self, dtype: str = "numeric"):
        super().__init__()
        self.dtype = dtype

    def fit(self, df: DataFrame) -> "DataFrameSelector":
        num_types = ("double", "float", "int", "bigint", "smallint", "decimal")
        if self.dtype == "numeric":
            self.selected_ = [c for c, t in df.dtypes if t.startswith(num_types)]
        else:
            self.selected_ = [c for c, t in df.dtypes if not t.startswith(num_types)]
        return self


def speed_rowwise_process(
    df: DataFrame,
    fn: Callable,
    schema: str,
) -> DataFrame:
    """Parallel row-batch apply (speed_rowwise_process,
    gofast/utils/base_utils.py:3038): the reference joblib-parallelizes a
    row function; here ``mapInPandas`` ships Arrow batches to every
    executor — the same escape hatch, cluster-wide.  ``fn`` maps a pandas
    DataFrame batch to a pandas DataFrame matching ``schema``."""

    def runner(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(runner, schema=schema)


def assess_outlier_impact(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    method: str = "iqr",
    factor: float = 1.5,
) -> DataFrame:
    """Model-metric delta with vs without outliers
    (assess_outlier_impact, gofast/dataops/quality.py:887): fit the same
    MLlib linear model on the full frame and the outlier-removed frame,
    report RMSE/r2 for both.  Output: (variant, rmse, r2, n)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from gofast_spark.quality import handle_outliers_in

    cleaned = handle_outliers_in(
        df, list(feature_cols) + [label_col], method=method,
        action="remove", factor=factor,
    )
    rows = []
    for variant, frame in (("with_outliers", df), ("without_outliers", cleaned)):
        data = VectorAssembler(
            inputCols=list(feature_cols), outputCol="__features"
        ).transform(frame)
        model = LinearRegression(
            featuresCol="__features", labelCol=label_col, predictionCol="__pred"
        ).fit(data)
        scored = model.transform(data)
        ev = RegressionEvaluator(labelCol=label_col, predictionCol="__pred")
        rows.append(
            (
                variant,
                float(ev.evaluate(scored, {ev.metricName: "rmse"})),
                float(ev.evaluate(scored, {ev.metricName: "r2"})),
                frame.count(),
            )
        )
    return df.sparkSession.createDataFrame(
        rows, "variant string, rmse double, r2 double, n bigint"
    )
