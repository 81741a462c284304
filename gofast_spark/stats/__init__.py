"""Statistics (SURVEY §2.10): descriptive natively; inferential via
sufficient statistics + scipy on the driver."""

from gofast_spark.stats.descriptive import (
    gumbel_fit,
    corr_matrix,
    describe,
    gini_coeff,
    get_range,
    hmean,
    iqr,
    quartiles,
    weighted_median,
)
from gofast_spark.stats.relationships import (
    cliffs_delta,
    correlation_ops,
    kendall_tau,
    kruskal_wallis,
    partial_corr,
    spearman_corr,
)
from gofast_spark.stats.causal import aipw_ate, ipw_ate
from gofast_spark.stats.multiple import fdr_bh, p_two_sided_from_z
from gofast_spark.stats.inferential import (
    cochran_armitage_trend,
    g_test,
    icc_oneway,
    two_proportion_test,
)
from gofast_spark.stats.sequential import (
    msprt_curve,
    msprt_day_moments,
    msprt_from_day_moments,
)
from gofast_spark.stats.survival import (
    kaplan_meier,
    logrank_test,
    nelson_aalen,
    weibull_fit,
)
from gofast_spark.stats.probs import (
    binomial_pmf,
    normal_cdf,
    normal_pdf,
    poisson_logpmf,
    uniform_sampling,
)
from gofast_spark.stats.comparisons import (
    compute_model_ranks,
    friedman_test_models,
    nemenyi_cd,
)
from gofast_spark.stats.evaluation import (
    aic_bic,
    chi2_gof,
    durbin_watson,
    jarque_bera,
    residual_analysis,
)
from gofast_spark.stats.mixed import mixed_effects_model
from gofast_spark.stats.ordination import (
    ca_residuals,
    dca_analysis,
    dca_analysis_power,
)
from gofast_spark.stats.resampling import bootstrap, bootstrap_ci
from gofast_spark.stats.inferential import (
    anova_test,
    cochran_q_test,
    rm_anova_test,
    cohens_d,
    mann_whitney_u,
    statistical_tests,
    t_test_paired,
    chi2_test,
    cronbach_alpha,
    friedman_test,
    ks_test_2samp,
    levene_test,
    mcnemar_test,
    t_test_independent,
    t_test_p_value,
    wilcoxon_signed_rank,
)

__all__ = [
    "aipw_ate",
    "ipw_ate",
    "kaplan_meier",
    "logrank_test",
    "cliffs_delta",
    "cochran_armitage_trend",
    "icc_oneway",
    "partial_corr",
    "fdr_bh",
    "g_test",
    "kendall_tau",
    "two_proportion_test",
    "msprt_curve",
    "msprt_day_moments",
    "msprt_from_day_moments",
    "p_two_sided_from_z",
    "nelson_aalen",
    "weibull_fit",
    "gumbel_fit",
    "bootstrap",
    "bootstrap_ci",
    "dca_analysis",
    "dca_analysis_power",
    "ca_residuals",
    "mixed_effects_model",
    "jarque_bera",
    "chi2_gof",
    "aic_bic",
    "durbin_watson",
    "residual_analysis",
    "normal_pdf",
    "normal_cdf",
    "binomial_pmf",
    "poisson_logpmf",
    "uniform_sampling",
    "compute_model_ranks",
    "friedman_test_models",
    "nemenyi_cd",
    "spearman_corr",
    "kruskal_wallis",
    "correlation_ops",
    "t_test_independent",
    "t_test_p_value",
    "t_test_paired",
    "cochran_q_test",
    "rm_anova_test",
    "cohens_d",
    "mann_whitney_u",
    "statistical_tests",
    "anova_test",
    "chi2_test",
    "ks_test_2samp",
    "levene_test",
    "mcnemar_test",
    "cronbach_alpha",
    "friedman_test",
    "wilcoxon_signed_rank",
    "describe",
    "quartiles",
    "iqr",
    "get_range",
    "hmean",
    "gini_coeff",
    "weighted_median",
    "corr_matrix",
]
