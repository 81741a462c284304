"""Closed-form distributed linear regression (normal equations).

OLS / ridge for tall-skinny data — the shape of virtually every tabular
regression at warehouse scale (billions of rows, a handful of features).
The entire fit is ONE distributed aggregation: the normal-equation
moments

    X'X  ((p+1) x (p+1) with intercept),  X'y,  y'y,  n

are sums of column products, computed map-side-partial in a single pass
over the data.  The driver then solves a (p+1)-dimensional linear system
— microseconds, independent of row count.  R^2 / SSE come from the SAME
moments (SSE = y'y - 2 w'X'y + w'(X'X)w), so fit + goodness-of-fit is
exactly one Spark job and one tiny collect.

This is the textbook scalable design (normal equations over moment
aggregates — the same structure MLlib's ``LinearRegression`` "normal"
solver uses); it beats iterative solvers whenever p is small enough that
X'X fits on the driver, which is p up to a few thousand.

Solvers: ``'numpy'`` (LAPACK ``solve`` — any p) or ``'cramer'`` (the
explicit determinant formula for p <= 2 with intercept, every operation
a fixed IEEE-double expression tree, so a SQL oracle replays the solve
step for step — the differential-testing twin, same role as the
landmark-IVF variant next to the k-means one).

Reference parity: the reference fits linear models through sklearn-style
estimators (gofast/estimators/, e.g. benchmark.py stacking regressors)
and ``gradient_descent`` (gofast/utils/mathext.py:5008, already ported
in ml/optim.py); this module is the exact closed-form counterpart.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _det3(m) -> float:
    """Determinant of a 3x3 (list-of-lists) in a FIXED expression order —
    mirrored verbatim by the SQL oracle (see catalog)."""
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _det2(m) -> float:
    return m[0][0] * m[1][1] - m[0][1] * m[1][0]


def _cramer_solve(A, b):
    """Solve A w = b (dim 2 or 3) by Cramer's rule in plain python
    floats — IEEE doubles, same arithmetic a SQL engine performs."""
    d = len(b)
    det = _det3(A) if d == 3 else _det2(A)
    if det == 0.0:
        raise ValueError("singular normal equations (collinear features?)")
    out = []
    for j in range(d):
        Aj = [[b[i] if k == j else A[i][k] for k in range(d)] for i in range(d)]
        out.append((_det3(Aj) if d == 3 else _det2(Aj)) / det)
    return out


def fit_linear_regression(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    ridge: float = 0.0,
    intercept: bool = True,
    solver: str = "numpy",
) -> dict:
    """Fit ``label ~ features`` by normal equations in one aggregation.

    Returns ``{"coef": [w_intercept?, w_f1, ...], "n": int, "r2": float,
    "sse": float, "sst": float}`` — coefficient order is intercept first
    (when requested) then ``feature_cols`` order.  ``ridge`` adds
    ``lambda`` to the diagonal of X'X for the FEATURE terms only (the
    intercept is never penalized — the standard convention).  Rows with
    any null feature/label are excluded.

    ``solver='cramer'`` (p <= 2 with intercept, or p <= 2/3 without)
    uses the fixed-order determinant formulas above for SQL-replayable
    arithmetic; ``'numpy'`` handles any p via LAPACK.
    """
    feats = list(feature_cols)
    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    d = df.where(cond)
    # design columns: optional constant 1 then the features, all double
    design: list[Column] = []
    if intercept:
        design.append(F.lit(1.0))
    design.extend(F.col(c).cast("double") for c in feats)
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
    row = d.agg(*aggs).first()
    n = row["n"]
    if n == 0:
        raise ValueError("no complete rows to fit on")
    A = [[0.0] * p for _ in range(p)]
    for i in range(p):
        for j in range(i, p):
            A[i][j] = A[j][i] = float(row[f"a_{i}_{j}"])
    if ridge:
        for i in range(1 if intercept else 0, p):
            A[i][i] += float(ridge)
    b = [float(row[f"b_{i}"]) for i in range(p)]
    if solver == "cramer":
        if p not in (2, 3):
            raise ValueError("cramer solver supports 2 or 3 unknowns")
        w = _cramer_solve(A, b)
    elif solver == "numpy":
        import numpy as np

        w = [float(v) for v in np.linalg.solve(np.array(A), np.array(b))]
    else:
        raise ValueError(f"unknown solver {solver!r}")
    yy = float(row["yy"])
    sy = b[0] if intercept else None
    sse = yy - 2.0 * sum(wi * bi for wi, bi in zip(w, b)) + sum(
        w[i] * A[i][j] * w[j] for i in range(p) for j in range(p)
    )
    if intercept:
        sst = yy - sy * sy / n
    else:
        sst = yy
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    return {"coef": w, "n": int(n), "r2": r2, "sse": sse, "sst": sst}


def predict_linear(
    df: DataFrame,
    model: dict | Sequence[float],
    feature_cols: Sequence[str],
    *,
    intercept: bool = True,
    out_col: str = "prediction",
) -> DataFrame:
    """Append ``out_col`` = the linear model's prediction — pure column
    arithmetic, codegen'd, no driver involvement at scoring time."""
    coef = list(model["coef"]) if isinstance(model, dict) else list(model)
    feats = list(feature_cols)
    expected = len(feats) + (1 if intercept else 0)
    if len(coef) != expected:
        raise ValueError(
            f"model has {len(coef)} coefficients, expected {expected}"
        )
    k = 0
    if intercept:
        expr = F.lit(float(coef[0]))
        k = 1
    else:
        expr = F.lit(0.0)
    for i, c in enumerate(feats):
        expr = expr + F.lit(float(coef[k + i])) * F.col(c).cast("double")
    return df.withColumn(out_col, expr)


def fit_logistic_regression(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    n_iter: int = 5,
    intercept: bool = True,
    solver: str = "numpy",
) -> dict:
    """Logistic regression by Newton / IRLS — one distributed moment
    aggregation PER ITERATION, driver-side (p+1)-dim solve between them.

    Each Newton step needs the gradient ``g = X'(y - p)`` and Hessian
    ``H = X' diag(p(1-p)) X`` at the current weights — both are sums of
    per-row expressions, so each iteration is a single Spark job whose
    shuffle payload is one (p+1)^2 moment row, however many rows X has.
    Convergence is quadratic: 3-5 iterations reach float precision on
    separable-ish data.  Start is w = 0 (p = 0.5 everywhere), the
    textbook choice, making the whole trajectory deterministic.

    ``solver='cramer'`` pins the per-step solve to the fixed-order
    determinant formulas (2 or 3 unknowns) so a layered SQL oracle can
    replay every iteration; ``'numpy'`` handles any p.  Labels must be
    0/1 (cast from boolean upstream).  Returns ``{"coef": [...],
    "n": int, "log_likelihood": float}`` with the intercept first when
    requested.
    """
    import math

    feats = list(feature_cols)
    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    d = df.where(cond)
    design: list[Column] = []
    if intercept:
        design.append(F.lit(1.0))
    design.extend(F.col(c).cast("double") for c in feats)
    y = F.col(label_col).cast("double")
    p = len(design)
    if solver == "cramer" and p not in (2, 3):
        raise ValueError("cramer solver supports 2 or 3 unknowns")
    if solver not in ("cramer", "numpy"):
        raise ValueError(f"unknown solver {solver!r}")
    w = [0.0] * p
    n = None
    for _ in range(int(n_iter)):
        z = F.lit(float(w[0])) * design[0]
        for i in range(1, p):
            z = z + F.lit(float(w[i])) * design[i]
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        s = prob * (F.lit(1.0) - prob)
        aggs = []
        for i in range(p):
            for j in range(i, p):
                aggs.append(
                    F.sum(s * design[i] * design[j]).alias(f"h_{i}_{j}")
                )
        for i in range(p):
            aggs.append(F.sum((y - prob) * design[i]).alias(f"g_{i}"))
        aggs.append(F.count(F.lit(1)).alias("n"))
        row = d.agg(*aggs).first()
        n = row["n"]
        if n == 0:
            raise ValueError("no complete rows to fit on")
        H = [[0.0] * p for _ in range(p)]
        for i in range(p):
            for j in range(i, p):
                H[i][j] = H[j][i] = float(row[f"h_{i}_{j}"])
        g = [float(row[f"g_{i}"]) for i in range(p)]
        if solver == "cramer":
            step = _cramer_solve(H, g)
        else:
            import numpy as np

            step = [float(v) for v in np.linalg.solve(np.array(H), np.array(g))]
        w = [wi + si for wi, si in zip(w, step)]
    # final log-likelihood in one extra pass (optional diagnostics)
    z = F.lit(float(w[0])) * design[0]
    for i in range(1, p):
        z = z + F.lit(float(w[i])) * design[i]
    ll = d.agg(
        F.sum(y * z - F.log(F.lit(1.0) + F.exp(z))).alias("ll")
    ).first()["ll"]
    return {"coef": w, "n": int(n), "log_likelihood": float(ll)}


def fit_linear_regression_grouped(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    group_cols: Sequence[str],
    *,
    intercept: bool = True,
) -> DataFrame:
    """ONE MODEL PER GROUP, fully in-plan: the per-group normal-equation
    moments come out of a single groupBy, and the coefficients are
    solved by fixed-order Cramer expressions ON COLUMNS — no collect,
    no driver loop, a million segment models cost one aggregation.
    (The global :func:`fit_linear_regression` solves on the driver
    because there is exactly one system; per-group systems must stay
    distributed.)

    Supports 2 or 3 unknowns (intercept + 1-2 features — the Cramer
    limit shared with ``solver='cramer'``).  Returns one row per group:
    (group..., w_0..w_{p-1}, n, r2) with the same coefficient order and
    sse/sst conventions as the global fitter.  Groups with singular
    normal equations (constant feature) yield NULL coefficients rather
    than failing the whole job.
    """
    feats = list(feature_cols)
    design: list[Column] = []
    if intercept:
        design.append(F.lit(1.0))
    design.extend(F.col(c).cast("double") for c in feats)
    p = len(design)
    if p not in (2, 3):
        raise ValueError("grouped fitter supports 2 or 3 unknowns")
    y = F.col(label_col).cast("double")
    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    aggs = []
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.sum(design[i] * design[j]).alias(f"a_{i}_{j}"))
    for i in range(p):
        aggs.append(F.sum(design[i] * y).alias(f"b_{i}"))
    aggs.append(F.sum(y * y).alias("yy"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    g = df.where(cond).groupBy(*group_cols).agg(*aggs)

    def a(i: int, j: int) -> Column:
        return F.col(f"a_{min(i, j)}_{max(i, j)}")

    def det3(c) -> Column:
        # same fixed expression order as _det3 so the oracle mirrors it
        return (
            c(0, 0) * (c(1, 1) * c(2, 2) - c(1, 2) * c(2, 1))
            - c(0, 1) * (c(1, 0) * c(2, 2) - c(1, 2) * c(2, 0))
            + c(0, 2) * (c(1, 0) * c(2, 1) - c(1, 1) * c(2, 0))
        )

    bcols = [F.col(f"b_{i}") for i in range(p)]
    if p == 2:
        det = a(0, 0) * a(1, 1) - a(0, 1) * a(1, 0)
        ws = [
            (bcols[0] * a(1, 1) - a(0, 1) * bcols[1]) / det,
            (a(0, 0) * bcols[1] - bcols[0] * a(1, 0)) / det,
        ]
    else:
        def cell(i: int, j: int, col_idx: int) -> Column:
            return bcols[i] if j == col_idx else a(i, j)

        det = det3(lambda i, j: a(i, j))
        ws = [
            det3(lambda i, j, k=k: cell(i, j, k)) / det for k in range(p)
        ]
    det_ok = det != 0.0
    ws = [F.when(det_ok, w) for w in ws]
    sse = F.col("yy")
    for i in range(p):
        sse = sse - 2.0 * ws[i] * bcols[i]
    for i in range(p):
        for j in range(p):
            sse = sse + ws[i] * a(i, j) * ws[j]
    if intercept:
        sst = F.col("yy") - bcols[0] * bcols[0] / F.col("n")
    else:
        sst = F.col("yy")
    r2 = F.when(sst > 0, 1.0 - sse / sst)
    return g.select(
        *group_cols,
        *[w.alias(f"w_{i}") for i, w in enumerate(ws)],
        "n",
        r2.alias("r2"),
    )


def fit_huber_regression(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    delta: float = 1.0,
    n_iter: int = 3,
) -> dict:
    """Robust simple regression by fixed-threshold Huber IRLS (Huber,
    Ann. Math. Statist. 1964; Holland & Welsch 1977 IRLS form): rows
    with residual ``|r| <= delta`` get weight 1, larger ones
    ``delta/|r|``, and each iteration re-solves the 2x2 weighted
    normal equations.

    ``delta`` is a FIXED threshold in y-units (no per-iteration scale
    re-estimate) so the whole trajectory — OLS start included — is a
    chain of single moment aggregates with a fixed-order Cramer 2x2
    solve between jobs, exactly the fit_logistic_regression shape:
    one Spark job per iteration regardless of row count, and a SQL
    oracle can replay every layer.  Returns ``{"intercept", "slope",
    "n"}``.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    d = df.where(x.isNotNull() & y.isNotNull())

    def wls(weight) -> "tuple[float, float, int]":
        row = d.agg(
            F.sum(weight).alias("sw"),
            F.sum(weight * x).alias("swx"),
            F.sum(weight * x * x).alias("swxx"),
            F.sum(weight * y).alias("swy"),
            F.sum(weight * x * y).alias("swxy"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        det = row["sw"] * row["swxx"] - row["swx"] * row["swx"]
        c = (row["swy"] * row["swxx"] - row["swx"] * row["swxy"]) / det
        b = (row["sw"] * row["swxy"] - row["swy"] * row["swx"]) / det
        return float(c), float(b), int(row["n"])

    c, b, n = wls(F.lit(1.0))
    for _ in range(int(n_iter)):
        r = F.abs(y - (F.lit(c) + F.lit(b) * x))
        weight = F.when(r <= F.lit(float(delta)), F.lit(1.0)).otherwise(
            F.lit(float(delta)) / r
        )
        c, b, n = wls(weight)
    return {"intercept": c, "slope": b, "n": n}


def fit_poisson_regression(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    n_iter: int = 4,
) -> dict:
    """Poisson regression with log link by Newton/IRLS (McCullagh &
    Nelder, *Generalized Linear Models*, 1989 §6): ``E[y] = exp(c +
    b x)``, each step solving

        H = X' diag(mu) X,   g = X'(y - mu),   w += H^-1 g

    from ONE distributed moment aggregate per iteration (the
    fit_logistic_regression shape) with the fixed-order Cramer 2x2
    between jobs — start w = 0 (mu = 1 everywhere), so the whole
    trajectory is deterministic and SQL-replayable.  Returns
    ``{"intercept", "slope", "n"}``.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    d = df.where(x.isNotNull() & y.isNotNull())
    c = b = 0.0
    n = 0
    for _ in range(int(n_iter)):
        mu = F.exp(F.lit(c) + F.lit(b) * x)
        row = d.agg(
            F.sum(mu).alias("h00"),
            F.sum(mu * x).alias("h01"),
            F.sum(mu * x * x).alias("h11"),
            F.sum(y - mu).alias("g0"),
            F.sum((y - mu) * x).alias("g1"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        n = int(row["n"])
        det = row["h00"] * row["h11"] - row["h01"] * row["h01"]
        c = c + (row["g0"] * row["h11"] - row["h01"] * row["g1"]) / det
        b = b + (row["h00"] * row["g1"] - row["g0"] * row["h01"]) / det
    return {"intercept": float(c), "slope": float(b), "n": n}


def cooks_distance_simple(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols,
    *,
    top_k: int = 20,
    units_x: float = 1e2,
    units_y: float = 1e2,
) -> DataFrame:
    """Top-``top_k`` most influential observations of a simple linear
    regression by Cook's distance (Cook, Technometrics 1977):

        D_i = e_i^2 / (p s^2) * h_i / (1 - h_i)^2,   p = 2
        h_i = 1/n + (x_i - xbar)^2 / Sxx,   s^2 = SSE / (n - 2)

    The fit, SSE (via ``Syy - b Sxy`` — no residual pass) and leverage
    terms all derive from ONE exact-integer moment aggregate
    (broadcast), so every per-row distance is engine-reproducible; the
    readout is a projection + TakeOrderedAndProject on the rounded
    score with key tie-breaks."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    xu = F.floor(x * F.lit(units_x) + F.lit(0.5)).cast("bigint")
    yu = F.floor(y * F.lit(units_y) + F.lit(0.5)).cast("bigint")
    d = df.where(x.isNotNull() & y.isNotNull()).select(
        *keys, xu.alias("__xu"), yu.alias("__yu")
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = d.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(dec("__xu")).alias("__sx"),
        F.sum(dec("__yu")).alias("__sy"),
        F.sum(dec("__xu") * F.col("__xu")).alias("__sxx"),
        F.sum(dec("__yu") * F.col("__yu")).alias("__syy"),
        F.sum(dec("__xu") * F.col("__yu")).alias("__sxy"),
    )
    n = F.col("__n").cast("decimal(19,0)")
    nd = F.col("__n").cast("double")
    sxx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")) \
        .cast("double")
    syy = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")) \
        .cast("double")
    sxy = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) \
        .cast("double")
    stats = m.select(
        "__n",
        (F.col("__sx").cast("double") / nd).alias("__mx"),
        (F.col("__sy").cast("double") / nd).alias("__my"),
        (sxy / sxx).alias("__b"),
        # Sxx and SSE carry the 1/n moment scaling: Sxx_c = sxx/n,
        # SSE = (syy - b*sxy)/n, both exact-moment-derived
        (sxx / nd).alias("__sxx_c"),
        ((syy - (sxy / sxx) * sxy) / nd).alias("__sse"),
    )
    j = d.crossJoin(F.broadcast(stats))
    nd2 = F.col("__n").cast("double")
    dx = F.col("__xu").cast("double") - F.col("__mx")
    e = (F.col("__yu").cast("double") - F.col("__my")
         - F.col("__b") * dx)
    h = F.lit(1.0) / nd2 + dx * dx / F.col("__sxx_c")
    s2 = F.col("__sse") / (nd2 - F.lit(2.0))
    cook = (e * e / (F.lit(2.0) * s2)) * h \
        / ((F.lit(1.0) - h) * (F.lit(1.0) - h))
    scored = j.select(*keys, F.round(cook, 6).alias("cooks_d"))
    return scored.orderBy(
        F.col("cooks_d").desc(), *[F.col(k) for k in keys]
    ).limit(top_k)


def elastic_net_cd_2f(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    *,
    l1: float = 0.1,
    l2: float = 0.1,
    sweeps: int = 8,
    units: float = 1e2,
) -> DataFrame:
    """Elastic-net fit for TWO standardized features by unrolled
    cyclic coordinate descent (Friedman, Hastie & Tibshirani, J. Stat.
    Softw. 2010 — the glmnet recurrence).  On standardized data the
    update collapses to scalar algebra over correlations:

        b_j <- S(r_jy - r_12 * b_other, l1) / (1 + l2),
        S(z, g) = sign(z) * max(|z| - g, 0)

    so after ONE exact-integer moment aggregate (the cramer/Gram
    discipline — correlations are ratios of decimal-widened sums) the
    whole optimization is ``2 * sweeps`` chained 1-ROW projections: no
    driver loop, no data rescan, bit-reproducible, and the oracle
    replays the identical chain.  Returns the standardized coefs, the
    de-standardized coefs + intercept, and n."""
    x1 = F.col(x1_col).cast("double")
    x2 = F.col(x2_col).cast("double")
    y = F.col(y_col).cast("double")
    u = lambda c: F.floor(c * F.lit(units) + F.lit(0.5)).cast("bigint")  # noqa: E731
    d = df.where(x1.isNotNull() & x2.isNotNull() & y.isNotNull()).select(
        u(x1).alias("__x1"), u(x2).alias("__x2"), u(y).alias("__y")
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = d.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(dec(f"__{a}")).alias(f"__s_{a}")
            for a in ("x1", "x2", "y")
        ],
        *[
            F.sum(dec(f"__{a}") * F.col(f"__{b}")).alias(f"__s_{a}{b}")
            for a, b in (("x1", "x1"), ("x2", "x2"), ("y", "y"),
                         ("x1", "x2"), ("x1", "y"), ("x2", "y"))
        ],
    )
    n = F.col("__n").cast("decimal(19,0)")

    def corr(ab: str, aa: str, bb: str, a: str, b: str):
        num = (n * F.col(f"__s_{ab}")
               - F.col(f"__s_{a}") * F.col(f"__s_{b}")).cast("double")
        da = (n * F.col(f"__s_{aa}")
              - F.col(f"__s_{a}") * F.col(f"__s_{a}")).cast("double")
        db = (n * F.col(f"__s_{bb}")
              - F.col(f"__s_{b}") * F.col(f"__s_{b}")).cast("double")
        return num / F.sqrt(da * db)

    base = m.select(
        "__n", "__s_x1", "__s_x2", "__s_y",
        corr("x1x2", "x1x1", "x2x2", "x1", "x2").alias("__r12"),
        corr("x1y", "x1x1", "yy", "x1", "y").alias("__r1y"),
        corr("x2y", "x2x2", "yy", "x2", "y").alias("__r2y"),
        # per-feature sd and mean (value units) for de-standardization
        *[
            a
            for name, saa, sa in (
                ("x1", "__s_x1x1", "__s_x1"),
                ("x2", "__s_x2x2", "__s_x2"),
                ("y", "__s_yy", "__s_y"),
            )
            for a in (
                (F.col(sa).cast("double") / F.col("__n").cast("double")
                 / F.lit(units)).alias(f"__mu_{name}"),
                (F.sqrt(
                    (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
                    / (n * n).cast("double")
                ) / F.lit(units)).alias(f"__sd_{name}"),
            )
        ],
    )

    def soft(z, g: float):
        return F.signum(z) * F.greatest(
            F.abs(z) - F.lit(g), F.lit(0.0)
        )

    cur = base.select("*", F.lit(0.0).alias("__b1"),
                      F.lit(0.0).alias("__b2"))
    for _ in range(sweeps):
        cur = cur.select(
            "*",
            (soft(F.col("__r1y") - F.col("__r12") * F.col("__b2"), l1)
             / F.lit(1.0 + l2)).alias("__nb1"),
        ).drop("__b1").withColumnRenamed("__nb1", "__b1")
        cur = cur.select(
            "*",
            (soft(F.col("__r2y") - F.col("__r12") * F.col("__b1"), l1)
             / F.lit(1.0 + l2)).alias("__nb2"),
        ).drop("__b2").withColumnRenamed("__nb2", "__b2")
    w1 = F.col("__b1") * F.col("__sd_y") / F.col("__sd_x1")
    w2 = F.col("__b2") * F.col("__sd_y") / F.col("__sd_x2")
    return cur.select(
        F.col("__b1").alias("beta1_std"),
        F.col("__b2").alias("beta2_std"),
        w1.alias("w1"),
        w2.alias("w2"),
        (F.col("__mu_y") - w1 * F.col("__mu_x1")
         - w2 * F.col("__mu_x2")).alias("intercept"),
        F.col("__n").cast("bigint").alias("n"),
    )


def information_criteria(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """AIC/BIC of the OLS fit ``label ~ features`` (Akaike 1974;
    Schwarz 1978; Burnham & Anderson 2002 for the concentrated
    Gaussian form; reference: gofast/stats/evaluation.py:1063-1071
    ``InformationCriteria.aic``/``.bic`` score fitted sklearn models
    eagerly):

        AIC = n ln(SSE/n) + 2k        BIC = n ln(SSE/n) + k ln n

    with ``k`` the design size (intercept + features) — the Gaussian
    log-likelihood concentrated over the error variance, dropping the
    model-free constant ``n(ln 2 pi + 1)`` (comparisons across models
    on the same rows are unaffected).

    One moment aggregation + fixed-order Cramer solve (the
    ml/regression discipline); ln compresses the moment sums'
    partition-order float noise by SSE, so round-4 presentation
    absorbs it (the regression-entry tolerance class).  Returns ONE
    row ``(n, k_params, r2, aic, bic)``."""
    import math

    feats = list(feature_cols)
    fit = fit_linear_regression(df, feats, label_col, solver="cramer")
    n = fit["n"]
    k = len(feats) + 1
    ll_core = n * math.log(fit["sse"] / n)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            n,
            k,
            round(fit["r2"], 6),
            round(ll_core + 2.0 * k, 4),
            round(ll_core + k * math.log(n), 4),
        )],
        "n bigint, k_params int, r2 double, aic double, bic double",
    )


def loco_importance(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
) -> DataFrame:
    """Leave-one-covariate-out (LOCO) importance for the two-feature
    OLS fit (Lei et al., JASA 2018 for the LOCO framing; reference:
    gofast/stats/evaluation.py:1487
    ``FeatureImportanceTests.permutation_importance_test`` — LOCO is
    the refit-based counterpart that closed-form OLS makes free): the
    drop in R^2 when each feature is removed and the model REFIT on
    the remaining one.

    ALL THREE fits (full 3-unknown, two reduced 2-unknown) come from
    ONE moment aggregation — the reduced normal equations are
    submatrices of the full Gram matrix, so no second scan.  Fixed
    -order Cramer arithmetic mirrored by the oracle; outputs rounded
    to 6 (ratio noise class).  Returns one row per feature
    ``(feature, r2_full, r2_reduced, delta_r2)`` ordered by feature."""
    feats = list(feature_cols)
    if len(feats) != 2:
        raise ValueError("loco_importance supports exactly 2 features")
    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    d = df.where(cond)
    x1 = F.col(feats[0]).cast("double")
    x2 = F.col(feats[1]).cast("double")
    y = F.col(label_col).cast("double")
    row = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("a01"),
        F.sum(x2).alias("a02"),
        F.sum(x1 * x1).alias("a11"),
        F.sum(x1 * x2).alias("a12"),
        F.sum(x2 * x2).alias("a22"),
        F.sum(y).alias("b0"),
        F.sum(x1 * y).alias("b1"),
        F.sum(x2 * y).alias("b2"),
        F.sum(y * y).alias("yy"),
    ).first()
    n = int(row["n"])
    a00 = float(n)
    a01, a02 = float(row["a01"]), float(row["a02"])
    a11, a12, a22 = float(row["a11"]), float(row["a12"]), float(row["a22"])
    b0, b1, b2 = float(row["b0"]), float(row["b1"]), float(row["b2"])
    yy = float(row["yy"])
    sst = yy - b0 * b0 / n

    def r2_of(A, b):
        w = _cramer_solve(A, b)
        p = len(b)
        sse = (
            yy
            - 2.0 * sum(wi * bi for wi, bi in zip(w, b))
            + sum(
                w[i] * A[i][j] * w[j]
                for i in range(p)
                for j in range(p)
            )
        )
        return 1.0 - sse / sst

    r2_full = r2_of(
        [[a00, a01, a02], [a01, a11, a12], [a02, a12, a22]],
        [b0, b1, b2],
    )
    r2_wo1 = r2_of([[a00, a02], [a02, a22]], [b0, b2])
    r2_wo2 = r2_of([[a00, a01], [a01, a11]], [b0, b1])
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (feats[0], round(r2_full, 6), round(r2_wo1, 6),
             round(r2_full - r2_wo1, 6)),
            (feats[1], round(r2_full, 6), round(r2_wo2, 6),
             round(r2_full - r2_wo2, 6)),
        ],
        "feature string, r2_full double, r2_reduced double, delta_r2 double",
    ).orderBy("feature")


def fit_probit_regression(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    *,
    n_iter: int = 3,
) -> dict:
    """Probit regression (intercept + ONE feature) by Fisher scoring
    (Bliss 1935 for the probit model; McCullagh & Nelder 1989, ch. 4
    for the scoring iteration) — the Gaussian-link companion of
    :func:`fit_logistic_regression`:

        g = sum x_i (y_i - p_i) phi(z_i) / (p_i (1 - p_i))
        I = sum x_i x_i' phi(z_i)^2 / (p_i (1 - p_i))

    with ``p = Phi(z)`` through the shared Abramowitz-Stegun erf
    polynomial and ``phi`` the shared normal pdf
    (stats/probs) — each iteration is ONE distributed moment
    aggregation + a fixed-order Cramer 2x2 update at w0 = (0, 0),
    exactly the layered-oracle recipe of the logistic entry.  p is
    clamped to [1e-10, 1 - 1e-10] on both engines.  Returns
    ``{"coef": [w0, w1], "n": int}``."""
    from gofast_spark.stats.probs import normal_cdf, normal_pdf

    cond = (
        F.col(label_col).isNotNull() & F.col(feature_col).isNotNull()
    )
    d = df.where(cond)
    x = F.col(feature_col).cast("double")
    y = F.col(label_col).cast("double")
    w = [0.0, 0.0]
    n = None
    for _ in range(int(n_iter)):
        z = F.lit(w[0]) * F.lit(1.0) + F.lit(w[1]) * x
        pc = F.least(
            F.greatest(normal_cdf(z), F.lit(1e-10)),
            F.lit(1.0 - 1e-10),
        )
        ph = normal_pdf(z)
        s = ph * ph / (pc * (F.lit(1.0) - pc))
        gf = (y - pc) * (ph / (pc * (F.lit(1.0) - pc)))
        row = d.agg(
            F.sum(s * F.lit(1.0) * F.lit(1.0)).alias("h00"),
            F.sum(s * F.lit(1.0) * x).alias("h01"),
            F.sum(s * x * x).alias("h11"),
            F.sum(gf * F.lit(1.0)).alias("g0"),
            F.sum(gf * x).alias("g1"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        h00, h01, h11 = float(row["h00"]), float(row["h01"]), float(row["h11"])
        g0, g1 = float(row["g0"]), float(row["g1"])
        n = int(row["n"])
        det = h00 * h11 - h01 * h01
        w = [
            w[0] + (g0 * h11 - h01 * g1) / det,
            w[1] + (h00 * g1 - g0 * h01) / det,
        ]
    return {"coef": w, "n": n}
