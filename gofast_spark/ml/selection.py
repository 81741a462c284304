"""Model-selection surface: deterministic k-fold assignment, one-pass
cross-validated OLS/ridge, and a one-pass regularization sweep.

Mirrors the reference's model-search utilities (``gofast/models/
optimize.py`` — CV search loops over sklearn estimators;
``gofast/models/validation.py`` fold handling) re-expressed for a
distributed engine:

- Folds are assigned by the repo's engine-portable LCG hash of a stable
  id (``operators.split_train_test_by_id`` recipe) — reproducible
  across engines, partitionings, and rounds: the property a
  leakage-audited training pipeline actually needs (sklearn's
  positional ``KFold`` is meaningless when row order is a shuffle
  artifact).
- The entire k-fold CV of a normal-equation linear model costs ONE
  distributed pass: a single groupBy(fold) aggregate yields each fold's
  Gram moments (X'X, X'y, y'y, n); fold f's TRAIN moments are the
  totals minus fold f's (moment additivity), the per-fold solve is a
  k x p^2 driver-side Cramer computation, and the held-out error needs
  no second scan because SSE_f = y'y_f - 2 w'X'y_f + w'X'X_f w is a
  function of the held-out fold's own moments.
- A ridge lambda sweep reuses the SAME per-fold moments for every
  lambda — hyperparameter search over closed-form models is one data
  scan total, not one per candidate, which is THE difference between a
  feasible and an infeasible search at 100 TB.

All driver-side arithmetic is fixed-order IEEE double (the
``ml.regression._cramer_solve`` discipline) so a SQL oracle can replay
it bit-for-bit up to presentation rounding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.ml.regression import _cramer_solve

# the portable LCG used by split_train_test_by_id / hash_split oracles
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648


def kfold_assign(
    df: DataFrame,
    id_col: str,
    k: int,
    *,
    seed: int = 0,
    out_col: str = "fold",
) -> DataFrame:
    """Append a deterministic fold id in ``[0, k)`` from an LCG hash of
    ``id_col`` — pure projection (codegen, no shuffle), stable under
    repartitioning, identical in any engine that has 64-bit integer
    arithmetic.  All rows sharing an id land in one fold, so id-level
    leakage across folds is structurally impossible."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = (
        (F.col(id_col).cast("bigint") + F.lit(seed)) * F.lit(_LCG_A)
        + F.lit(_LCG_C)
    ) % F.lit(_LCG_M) % F.lit(k)
    return df.withColumn(out_col, h.cast("int"))


def _fold_moments(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    id_col: str,
    k: int,
    seed: int,
):
    """One groupBy(fold) pass -> per-fold Gram moments as driver rows.

    Returns ``(p, rows)`` where rows[f] holds a_{i}_{j} (upper
    triangle), b_i, yy, n for fold f; p includes the intercept column.
    Bounded driver data: k rows of p^2 doubles."""
    feats = list(feature_cols)
    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    d = kfold_assign(df.where(cond), id_col, k, seed=seed)
    design = [F.lit(1.0)] + [F.col(c).cast("double") for c in feats]
    y = F.col(label_col).cast("double")
    p = len(design)
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum(design[i] * design[j]).alias(f"a_{i}_{j}"))
    for i in range(p):
        aggs.append(F.sum(design[i] * y).alias(f"b_{i}"))
    aggs.append(F.sum(y * y).alias("yy"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    rows = {r["fold"]: r for r in d.groupBy("fold").agg(*aggs).collect()}
    return p, rows


def _solve_and_score(p: int, rows: dict, fold: int, ridge: float):
    """Train on all folds except ``fold`` (moment subtraction), score on
    the held-out fold's own moments.  Returns (w, n_test, sse_test)."""
    A = [[0.0] * p for _ in range(p)]
    b = [0.0] * p
    # sorted fold order: deterministic float accumulation (collect()
    # row order is not)
    for f in sorted(rows):
        r = rows[f]
        if f == fold:
            continue
        for i in range(p):
            for j in range(i, p):
                A[i][j] += float(r[f"a_{i}_{j}"])
            b[i] += float(r[f"b_{i}"])
    for i in range(p):
        for j in range(i):
            A[i][j] = A[j][i]
    if ridge:
        for i in range(1, p):  # never penalize the intercept
            A[i][i] += float(ridge)
    w = _cramer_solve(A, b)
    t = rows[fold]
    At = [[0.0] * p for _ in range(p)]
    for i in range(p):
        for j in range(i, p):
            At[i][j] = At[j][i] = float(t[f"a_{i}_{j}"])
    bt = [float(t[f"b_{i}"]) for i in range(p)]
    sse = (
        float(t["yy"])
        - 2.0 * sum(w[i] * bt[i] for i in range(p))
        + sum(w[i] * At[i][j] * w[j] for i in range(p) for j in range(p))
    )
    return w, int(t["n"]), sse


def cross_val_linear(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    id_col: str,
    k: int = 4,
    seed: int = 0,
    ridge: float = 0.0,
) -> DataFrame:
    """k-fold cross-validated normal-equation OLS/ridge in ONE
    distributed pass (see module docstring).  Returns one row per fold:
    ``(fold, n_test, rmse, w0..wp)`` with fixed-order Cramer arithmetic
    (p = 2 features + intercept supported, the SQL-replayable regime).
    """
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("cross_val_linear supports exactly 2 features "
                         "(3x3 Cramer, the SQL-replayable regime)")
    p, rows = _fold_moments(df, feats, label_col, id_col, k, seed)
    missing = [f for f in range(k) if f not in rows]
    if missing:
        raise ValueError(f"empty folds {missing}: id space too small for k={k}")
    out = []
    for f in range(k):
        w, n_test, sse = _solve_and_score(p, rows, f, ridge)
        rmse = (sse / n_test) ** 0.5 if n_test else float("nan")
        out.append((f, n_test, rmse, w[0], w[1], w[2]))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "fold int, n_test bigint, rmse double, "
             "w0 double, w1 double, w2 double",
    )


def ridge_cv_sweep(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    id_col: str,
    lambdas: Sequence[float],
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Cross-validated regularization sweep sharing ONE set of fold
    moments across every lambda: total cost is a single data scan
    regardless of ``len(lambdas)``.  Returns ``(lam, mean_rmse)`` per
    candidate — order by ``mean_rmse`` to pick the winner."""
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("ridge_cv_sweep supports exactly 2 features")
    lams = [float(x) for x in lambdas]
    if not lams:
        raise ValueError("lambdas must be non-empty")
    p, rows = _fold_moments(df, feats, label_col, id_col, k, seed)
    missing = [f for f in range(k) if f not in rows]
    if missing:
        raise ValueError(f"empty folds {missing}: id space too small for k={k}")
    out = []
    for lam in lams:
        tot = 0.0
        for f in range(k):
            _w, n_test, sse = _solve_and_score(p, rows, f, lam)
            tot += (sse / n_test) ** 0.5
        out.append((lam, tot / k))
    spark = df.sparkSession
    return spark.createDataFrame(out, "lam double, mean_rmse double")


def random_search_lcg_picks(
    grid_size: int, n_trials: int, seed: int
) -> list[int]:
    """The deterministic index sequence of :func:`random_search_ridge`:
    trial i's grid index is the i-th LCG state (the repo's portable
    LCG, same constants as :func:`kfold_assign`) mod ``grid_size`` —
    pure 63-bit-safe integer arithmetic, replayable verbatim in SQL."""
    if grid_size < 1:
        raise ValueError("grid must be non-empty")
    picks = []
    s = seed
    for _ in range(n_trials):
        s = (_LCG_A * s + _LCG_C) % _LCG_M
        picks.append(s % grid_size)
    return picks


def random_search_ridge(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    id_col: str,
    grid: Sequence[float],
    n_trials: int = 8,
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Random hyperparameter search over a discrete ridge-lambda grid
    (Bergstra & Bengio, "Random Search for Hyper-Parameter
    Optimization", JMLR 2012; the reference's search surface is
    gofast/models/optimize.py RandomizedSearchCV wrapping): ``n_trials``
    draws with replacement via the portable LCG, and EVERY trial is
    scored from the same single set of CV fold moments — one data scan
    regardless of trial count, the closed-form-model property that
    makes wide searches feasible at 100 TB.  Sampling from a discrete
    grid keeps the draw integer-exact across engines (a log-uniform
    continuous draw would go through exp/ln, which differ by 1 ulp
    between JVM Math and libm — see the r9 parity notes).

    Returns ``(trial, lam, mean_rmse)`` — one row per trial, duplicate
    lambdas solved once and mapped back."""
    g = [float(x) for x in grid]
    if n_trials < 1:
        raise ValueError("n_trials must be >= 1")
    lams = [g[j] for j in random_search_lcg_picks(len(g), n_trials, seed)]
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("random_search_ridge supports exactly 2 features")
    p, rows = _fold_moments(df, feats, label_col, id_col, k, seed)
    missing = [f for f in range(k) if f not in rows]
    if missing:
        raise ValueError(f"empty folds {missing}: id space too small for k={k}")
    rmse_by_lam = {}
    for lam in sorted(set(lams)):
        tot = 0.0
        for f in range(k):
            _w, n_test, sse = _solve_and_score(p, rows, f, lam)
            tot += (sse / n_test) ** 0.5
        rmse_by_lam[lam] = tot / k
    out = [(i, lam, rmse_by_lam[lam]) for i, lam in enumerate(lams)]
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "trial int, lam double, mean_rmse double"
    )


def smbo_quadratic_ridge(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    id_col: str,
    grid: Sequence[float],
    rounds: int = 3,
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Sequential model-based hyperparameter optimization over a
    discrete ridge-lambda grid (SMBO: Hutter, Hoos & Leyton-Brown,
    LION 2011 — SMAC; Jones, Schonlau & Welch, J. Global Optim. 1998 —
    EGO; the reference dispatches the same search family to
    ``BayesSearchCV``, gofast/models/_optimize.py:703-719, and
    describes sequential model-based optimization in
    gofast/models/_selection.py:1513).

    The loop is the classic surrogate/acquire/evaluate cycle:

    1. evaluate a space-filling INITIAL DESIGN (grid ends + middle);
    2. fit a quadratic response-surface surrogate
       ``mu(j) = c0 + c1 j + c2 j^2`` over the observed
       (grid-index, CV-RMSE) points by least squares;
    3. ACQUIRE the unobserved grid index minimizing the surrogate
       (ties -> smallest index), evaluate it, refit, repeat.

    Every evaluation is scored from ONE set of CV fold moments (the
    :func:`ridge_cv_sweep` property) — the whole sequential search
    costs a single data scan, so "sequential" here spends driver
    microseconds, not cluster passes.  Engine-reproducibility
    discipline: observations enter the surrogate as exact integers
    (RMSE quantized to 1e-4 units), the surrogate's normal equations
    use integer moments of grid INDICES (never the float lambdas), the
    solve is the fixed-order Cramer tree (`ml.regression._cramer_solve`
    — mirrored verbatim by the SQL oracle), and the per-candidate fold
    RMSE total is accumulated in explicit fold order.  The acquisition
    argmin therefore replays bit-for-bit in SQL.

    Returns one row per evaluation: ``(step, phase, grid_j, lam,
    mean_rmse)`` with phase 'init' or 'smbo' and mean_rmse presented
    in the exact 1e-4-unit quantization the surrogate consumed."""
    g = [float(x) for x in grid]
    if len(g) < 4:
        raise ValueError("grid must have >= 4 candidates")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("smbo_quadratic_ridge supports exactly 2 features")
    init = [0, len(g) // 2, len(g) - 1]
    if rounds > len(g) - len(init):
        raise ValueError("rounds exceed unobserved grid size")
    p, rows = _fold_moments(df, feats, label_col, id_col, k, seed)
    missing = [f for f in range(k) if f not in rows]
    if missing:
        raise ValueError(f"empty folds {missing}: id space too small for k={k}")
    import math

    def y_u4(j: int) -> int:
        # explicit fold-order accumulation (0..k-1): the SQL oracle
        # sums the same pivoted CASE terms left-to-right
        tot = 0.0
        for f in range(k):
            _w, n_test, sse = _solve_and_score(p, rows, f, g[j])
            tot = tot + (sse / n_test) ** 0.5
        return int(math.floor(tot / k * 1e4 + 0.5))

    observed: dict[int, int] = {}
    out = []
    for step, j in enumerate(init):
        observed[j] = y_u4(j)
        out.append((step, "init", j, g[j], observed[j] / 1e4))
    for r in range(rounds):
        # quadratic LS surrogate from integer moments (exact bigint
        # sums — order-independent), fixed-order Cramer solve
        pts = sorted(observed.items())
        S = [0] * 5
        T = [0] * 3
        for j, y in pts:
            jp = 1
            for q in range(5):
                S[q] += jp
                if q < 3:
                    T[q] += y * jp
                jp *= j
        A = [
            [float(S[0]), float(S[1]), float(S[2])],
            [float(S[1]), float(S[2]), float(S[3])],
            [float(S[2]), float(S[3]), float(S[4])],
        ]
        b = [float(T[0]), float(T[1]), float(T[2])]
        c0, c1, c2 = _cramer_solve(A, b)
        # acquisition: surrogate argmin over unobserved indices,
        # tie-break smallest index — same (mu, j) ordering in SQL
        best_j, best_mu = None, None
        for j in range(len(g)):
            if j in observed:
                continue
            mu = c0 + c1 * j + c2 * (j * j)
            if best_mu is None or mu < best_mu:
                best_j, best_mu = j, mu
        observed[best_j] = y_u4(best_j)
        out.append(
            (len(init) + r, "smbo", best_j, g[best_j],
             observed[best_j] / 1e4)
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "step int, phase string, grid_j int, lam double, mean_rmse double",
    )


def successive_halving_ridge(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    id_col: str,
    grid: Sequence[float],
    k: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Successive-halving hyperparameter search over a discrete
    ridge-lambda grid (Karnin, Koren & Somekh, ICML 2013; Jamieson &
    Talwalkar, AISTATS 2016 — the elimination core of Hyperband): rung
    r scores the surviving candidates on a growing budget (here: the
    mean held-out RMSE over folds ``0..r``) and keeps the best half,
    until one survivor remains.

    Like every search in this module, ALL evaluations derive from one
    set of CV fold moments — a rung's extra "budget" is driver
    arithmetic, not another data pass; the halving schedule is the
    interface parity point (the reference's search family,
    gofast/models/optimize.py).  Determinism: per-(candidate, fold)
    RMSEs are quantized to 1e-4 units once, rung scores are integer
    SUMS of those units (no means — same ranking, exact arithmetic),
    and elimination ranks on ``(score, grid index)`` — total order,
    engine-replayable.

    Returns one row per (rung, evaluated candidate):
    ``(rung, grid_j, lam, score_u4, kept)`` with ``score_u4`` the
    integer sum of the rung's per-fold RMSE units."""
    g = [float(x) for x in grid]
    if len(g) < 2:
        raise ValueError("grid must have >= 2 candidates")
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("successive_halving_ridge supports exactly 2 features")
    import math

    rungs = int(math.ceil(math.log2(len(g))))
    if rungs > k:
        raise ValueError(
            f"need k >= log2(len(grid)) folds for the budget schedule "
            f"({rungs} rungs, k={k})"
        )
    p, rows = _fold_moments(df, feats, label_col, id_col, k, seed)
    missing = [f for f in range(k) if f not in rows]
    if missing:
        raise ValueError(f"empty folds {missing}: id space too small for k={k}")
    u4 = {}
    for j in range(len(g)):
        for f in range(k):
            _w, n_test, sse = _solve_and_score(p, rows, f, g[j])
            u4[(j, f)] = int(math.floor((sse / n_test) ** 0.5 * 1e4 + 0.5))
    alive = list(range(len(g)))
    out = []
    for r in range(rungs):
        scored = sorted(
            (sum(u4[(j, f)] for f in range(r + 1)), j) for j in alive
        )
        keep = max(1, len(alive) // 2)
        kept = {j for _s, j in scored[:keep]}
        for s, j in scored:
            out.append((r, j, g[j], s, j in kept))
        alive = sorted(kept)
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "rung int, grid_j int, lam double, score_u4 bigint, kept boolean",
    )


def learning_curve_linear(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    id_col: str,
    n_steps: int = 4,
    seed: int = 0,
    ridge: float = 0.0,
) -> DataFrame:
    """Learning curve (holdout RMSE vs training-set size) for a
    normal-equation linear model in ONE distributed pass.

    Ids hash into ``n_steps + 1`` LCG buckets; the last bucket is a
    FIXED holdout, and training set j (j = 1..n_steps) is the union of
    buckets ``0..j-1`` — so train moments are cumulative sums of the
    per-bucket Gram moments from the single groupBy pass, and every
    point of the curve scores against the same holdout moments.  The
    sklearn ``learning_curve`` question (is more data still buying
    accuracy?) answered without one refit scan per point — the
    difference between a feasible and an infeasible diagnostic at
    100 TB.  Returns ``(step, n_train, n_test, rmse)``."""
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("learning_curve_linear supports exactly 2 features")
    if n_steps < 2:
        raise ValueError("n_steps must be >= 2")
    k = n_steps + 1
    p, rows = _fold_moments(df, feats, label_col, id_col, k, seed)
    missing = [f for f in range(k) if f not in rows]
    if missing:
        raise ValueError(f"empty buckets {missing}: id space too small")
    hold = rows[k - 1]
    Ah = [[0.0] * p for _ in range(p)]
    for i in range(p):
        for j in range(i, p):
            Ah[i][j] = Ah[j][i] = float(hold[f"a_{i}_{j}"])
    bh = [float(hold[f"b_{i}"]) for i in range(p)]
    n_test = int(hold["n"])
    A = [[0.0] * p for _ in range(p)]
    b = [0.0] * p
    out = []
    n_train = 0
    for j in range(n_steps):
        r = rows[j]
        for i in range(p):
            for c in range(i, p):
                A[i][c] += float(r[f"a_{i}_{c}"])
            b[i] += float(r[f"b_{i}"])
        n_train += int(r["n"])
        At = [[A[i][c] if c >= i else A[c][i] for c in range(p)]
              for i in range(p)]
        if ridge:
            for i in range(1, p):
                At[i][i] += float(ridge)
        w = _cramer_solve(At, b)
        sse = (
            float(hold["yy"])
            - 2.0 * sum(w[i] * bh[i] for i in range(p))
            + sum(w[i] * Ah[i][c] * w[c] for i in range(p) for c in range(p))
        )
        out.append((j + 1, n_train, n_test, (sse / n_test) ** 0.5))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "step int, n_train bigint, n_test bigint, rmse double"
    )
