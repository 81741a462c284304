"""MLlib pipeline mirrors of the reference's feature-prep surface.

Reference: ``Features.fit(X).normalize().encode_categorical()...``
(gofast/dataops/preprocessing.py:1273-2232) and the 40+ sklearn-style
transformers (gofast/transformers/feature_engineering.py).  The Spark
analog is an MLlib ``Pipeline`` of Estimator stages — fit computes the
statistics distributed, transform stays lazy, and the fitted
``PipelineModel`` serializes for reuse (the sklearn fit/transform
contract at cluster scale).

Dimensionality reduction / clustering (``nPCA``
gofast/analysis/dimensionality.py:154; ``perform_kmeans_clustering``
gofast/stats/relationships.py:319) map to MLlib ``PCA`` / ``KMeans``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def make_feature_pipeline(
    num_cols: Sequence[str],
    cat_cols: Sequence[str] = (),
    *,
    impute: str = "mean",
    scale: bool = True,
    one_hot: bool = True,
    output_col: str = "features",
):
    """Build the standard prep pipeline: Imputer(num) -> StringIndexer +
    OneHotEncoder(cat) -> VectorAssembler -> StandardScaler.

    Returns an unfitted ``pyspark.ml.Pipeline`` (call ``.fit(df)``).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import (
        Imputer,
        OneHotEncoder,
        StandardScaler,
        StringIndexer,
        VectorAssembler,
    )

    stages = []
    num_out = [f"{c}__imp" for c in num_cols]
    if num_cols:
        stages.append(
            Imputer(strategy=impute, inputCols=list(num_cols), outputCols=num_out)
        )
    cat_vec = []
    for c in cat_cols:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}__idx", handleInvalid="keep")
        )
        if one_hot:
            stages.append(OneHotEncoder(inputCol=f"{c}__idx", outputCol=f"{c}__oh"))
            cat_vec.append(f"{c}__oh")
        else:
            cat_vec.append(f"{c}__idx")
    assembled = "__assembled" if scale else output_col
    stages.append(
        VectorAssembler(inputCols=num_out + cat_vec, outputCol=assembled)
    )
    if scale:
        stages.append(
            StandardScaler(
                inputCol=assembled, outputCol=output_col, withMean=False, withStd=True
            )
        )
    return Pipeline(stages=stages)


def fit_pca(df: DataFrame, features_col: str, k: int, *, out_col: str = "pca"):
    """MLlib PCA (nPCA, gofast/analysis/dimensionality.py:154).  Returns
    (model, transformed frame)."""
    from pyspark.ml.feature import PCA

    model = PCA(k=k, inputCol=features_col, outputCol=out_col).fit(df)
    return model, model.transform(df)


def fit_kmeans(
    df: DataFrame, features_col: str, k: int, *, seed: int = 42, out_col: str = "cluster"
):
    """MLlib KMeans (perform_kmeans_clustering,
    gofast/stats/relationships.py:319).  Returns (model, frame with
    cluster assignments)."""
    from pyspark.ml.clustering import KMeans

    model = KMeans(
        k=k, seed=seed, featuresCol=features_col, predictionCol=out_col
    ).fit(df)
    return model, model.transform(df)
