"""MLlib pipeline mirrors (SURVEY §2.14)."""

from gofast_spark.ml.pipeline import (
    fit_kmeans,
    fit_pca,
    make_feature_pipeline,
)

__all__ = ["make_feature_pipeline", "fit_pca", "fit_kmeans"]
