"""Cross-model statistical comparison utilities (SURVEY §2.10 model
comparison row).

Reference: ``compute_model_ranks`` (gofast/stats/comparisons.py:1252),
``friedman_test_in`` (:559), ``nemenyi_posthoc`` critical distance
(:413, 847).  Inputs are k models x n folds score matrices — tiny by
construction — so, per SURVEY §2.10's own mapping, these run driver-side
over a collected matrix; the heavy lifting (producing per-fold scores)
is the distributed part and lives in :mod:`gofast_spark.metrics`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def _score_matrix(df: DataFrame, model_col: str, fold_col: str, score_col: str):
    rows = df.select(model_col, fold_col, score_col).collect()
    models = sorted({r[model_col] for r in rows})
    folds = sorted({r[fold_col] for r in rows})
    m = {(r[model_col], r[fold_col]): r[score_col] for r in rows}
    missing = [(mo, f) for mo in models for f in folds if (mo, f) not in m]
    if missing:
        raise ValueError(f"incomplete score matrix; missing cells: {missing[:5]}")
    return models, folds, m


def compute_model_ranks(
    df: DataFrame,
    model_col: str = "model",
    fold_col: str = "fold",
    score_col: str = "score",
    *,
    higher_is_better: bool = True,
) -> DataFrame:
    """Average rank of each model across folds
    (compute_model_ranks, gofast/stats/comparisons.py:1252).  Rank 1 =
    best; ties get average ranks.  Output: (model, avg_rank, n_folds)."""
    models, folds, m = _score_matrix(df, model_col, fold_col, score_col)
    totals = {mo: 0.0 for mo in models}
    for f in folds:
        scored = sorted(
            models,
            key=lambda mo: -m[(mo, f)] if higher_is_better else m[(mo, f)],
        )
        i = 0
        while i < len(scored):
            j = i
            while (
                j + 1 < len(scored)
                and m[(scored[j + 1], f)] == m[(scored[i], f)]
            ):
                j += 1
            avg = (i + j) / 2.0 + 1.0
            for t in range(i, j + 1):
                totals[scored[t]] += avg
            i = j + 1
    rows = [(mo, totals[mo] / len(folds), len(folds)) for mo in models]
    return df.sparkSession.createDataFrame(
        rows, "model string, avg_rank double, n_folds bigint"
    )


def friedman_test_models(
    df: DataFrame,
    model_col: str = "model",
    fold_col: str = "fold",
    score_col: str = "score",
    *,
    higher_is_better: bool = True,
) -> dict:
    """Friedman chi-square over the model x fold score matrix
    (gofast/stats/comparisons.py:559).  Returns a small dict (statistic,
    dof, k_models, n_folds) — driver-side by design."""
    ranks = {
        r["model"]: r["avg_rank"]
        for r in compute_model_ranks(
            df, model_col, fold_col, score_col, higher_is_better=higher_is_better
        ).collect()
    }
    k = len(ranks)
    n = df.select(fold_col).distinct().count()
    s = sum((n * r) ** 2 for r in ranks.values())
    chi2 = 12.0 / (n * k * (k + 1)) * s - 3.0 * n * (k + 1)
    return {"statistic": chi2, "dof": k - 1, "k_models": k, "n_folds": n}


def nemenyi_cd(k_models: int, n_folds: int, *, alpha: float = 0.05) -> float:
    """Nemenyi critical distance (compute_cd,
    gofast/stats/comparisons.py:413): models whose average ranks differ
    by more than CD are significantly different."""
    # studentized range q_alpha / sqrt(2) for alpha=0.05 / 0.10, k=2..10
    q_05 = [1.960, 2.343, 2.569, 2.728, 2.850, 2.949, 3.031, 3.102, 3.164]
    q_10 = [1.645, 2.052, 2.291, 2.459, 2.589, 2.693, 2.780, 2.855, 2.920]
    table = q_05 if alpha <= 0.05 else q_10
    if not 2 <= k_models <= len(table) + 1:
        raise ValueError("k_models must be in [2, 10] for the built-in table")
    q = table[k_models - 2]
    return q * math.sqrt(k_models * (k_models + 1) / (6.0 * n_folds))
