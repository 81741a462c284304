"""MLlib pipeline mirrors + dimensionality reduction (SURVEY §2.14)."""

from gofast_spark.ml.pipeline import (
    fit_kmeans,
    fit_pca,
    make_feature_pipeline,
)
from gofast_spark.ml.graph import edges_from_pairs, pagerank
from gofast_spark.ml.optim import gradient_descent, linkage_matrix
from gofast_spark.ml.regression import (
    fit_linear_regression,
    fit_linear_regression_grouped,
    fit_logistic_regression,
    predict_linear,
)
from gofast_spark.ml.dimensionality import (
    classical_mds,
    kernel_pca,
    lle_embedding,
    spectral_embedding,
)

__all__ = [
    "make_feature_pipeline",
    "fit_pca",
    "fit_kmeans",
    "kernel_pca",
    "classical_mds",
    "spectral_embedding",
    "lle_embedding",
    "gradient_descent",
    "fit_linear_regression",
    "fit_linear_regression_grouped",
    "fit_logistic_regression",
    "predict_linear",
    "linkage_matrix",
    "edges_from_pairs",
    "pagerank",
]
