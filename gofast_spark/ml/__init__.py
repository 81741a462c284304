"""MLlib pipeline mirrors + dimensionality reduction (SURVEY §2.14)."""

from gofast_spark.ml.pipeline import (
    fit_kmeans,
    fit_pca,
    make_feature_pipeline,
)
from gofast_spark.ml.graph import edges_from_pairs, link_prediction, pagerank
from gofast_spark.ml.mixture_em import fit_gmm2
from gofast_spark.ml.optim import gradient_descent, linkage_matrix
from gofast_spark.ml.regression import (
    fit_huber_regression,
    fit_linear_regression,
    fit_linear_regression_grouped,
    fit_logistic_regression,
    fit_poisson_regression,
    predict_linear,
)
from gofast_spark.ml.dimensionality import (
    classical_mds,
    kernel_pca,
    kernel_pca_power,
    varimax_rotation,
    lle_embedding,
    spectral_embedding,
)
from gofast_spark.ml.bayes import fit_gaussian_nb, predict_gaussian_nb
from gofast_spark.ml.bagging import fit_bagged_stumps
from gofast_spark.ml.boost import fit_boosted_stumps
from gofast_spark.ml.conformal import split_conformal_group_mean
from gofast_spark.ml.dbscan import dbscan
from gofast_spark.ml.encoding import target_encode, woe_encode
from gofast_spark.ml.itemsets import association_rules, frequent_pairs
from gofast_spark.ml.kmeans_exact import fit_kmeans_lloyd, kmeans_inertia
from gofast_spark.ml.recommend import item_similarity_topk
from gofast_spark.ml.stacking import fit_stacking_ols
from gofast_spark.ml.selection import (
    cross_val_linear,
    kfold_assign,
    learning_curve_linear,
    ridge_cv_sweep,
)
from gofast_spark.ml.stump import fit_stump

__all__ = [
    "make_feature_pipeline",
    "fit_pca",
    "fit_kmeans",
    "kernel_pca",
    "kernel_pca_power",
    "varimax_rotation",
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
    "fit_gaussian_nb",
    "predict_gaussian_nb",
    "fit_bagged_stumps",
    "fit_boosted_stumps",
    "split_conformal_group_mean",
    "dbscan",
    "target_encode",
    "woe_encode",
    "frequent_pairs",
    "association_rules",
    "fit_kmeans_lloyd",
    "kmeans_inertia",
    "kfold_assign",
    "cross_val_linear",
    "ridge_cv_sweep",
    "learning_curve_linear",
    "fit_stacking_ols",
    "fit_huber_regression",
    "fit_gmm2",
    "fit_poisson_regression",
    "link_prediction",
    "fit_stump",
    "item_similarity_topk",
]
