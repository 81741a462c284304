"""Mixed-effects (random-intercept) linear model.

Reference: ``mixed_effects_model`` (gofast/stats/inferential.py:661) fits
``y = X beta + Z gamma + eps`` with statsmodels MixedLM on an in-memory
frame.  The distributed re-expression covers the workhorse case — one
random INTERCEPT per group — with closed-form linear algebra instead of
an iterative optimizer:

1. per-group sufficient statistics: ``n_g, X'X_g, X'y_g, sum(x)_g,
   sum(y)_g, y'y_g`` — one groupBy, map-side combinable;
2. variance components by the ANOVA method of moments on OLS residuals
   (sigma2 from within-group scatter, sigma2_u from between-group means);
3. GLS with the Woodbury identity: for a random intercept,
   ``V_g^{-1} = (1/s2)(I - c_g J)`` with ``c_g = lam/(1 + n_g lam)``,
   ``lam = s2_u/s2`` — so the GLS normal equations are SUMS OVER GROUPS
   of outer products of the per-group vectors.  That second reduction is
   another aggregation: group count never hits the driver; only the
   (d+1)x(d+1) normal matrix does.

Omitted vs the reference: random slopes (re_formula) and REML-iterated
variance components — documented, raise on request.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mixed_effects_model(
    df: DataFrame,
    y_col: str,
    x_cols: Sequence[str],
    group_col: str,
    *,
    re_formula: str | None = None,
) -> DataFrame:
    """Random-intercept LMM.  Output: (term, value) rows — 'intercept'
    and one row per feature (GLS betas), then 'sigma2', 'sigma2_u',
    'lambda', 'n_groups', 'n_obs'."""
    if re_formula is not None:
        raise NotImplementedError(
            "random slopes (re_formula) are not supported; only the "
            "random-intercept model is distributed here"
        )
    import numpy as np

    xs = list(x_cols)
    d = len(xs) + 1  # + intercept
    cols = [F.lit(1.0).alias("__x0")] + [
        F.col(c).cast("double").alias(f"__x{i+1}") for i, c in enumerate(xs)
    ]
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(y_col).cast("double").alias("__y"),
        *cols,
    ).na.drop()

    # ---- pass 1: per-group sufficient statistics
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.col(f"__x{i}") * F.col(f"__x{j}")).alias(f"xx_{i}_{j}")
            )
    for i in range(d):
        aggs.append(F.sum(F.col(f"__x{i}") * F.col("__y")).alias(f"xy_{i}"))
        aggs.append(F.sum(F.col(f"__x{i}")).alias(f"sx_{i}"))
    aggs.append(F.sum("__y").alias("sy"))
    aggs.append(F.sum(F.col("__y") * F.col("__y")).alias("yy"))
    grp = base.groupBy("__g").agg(*aggs).persist()

    try:
        # ---- OLS (c_g = 0): global sums of the per-group stats
        tot = grp.agg(
            *[F.sum(c).alias(c) for c in grp.columns if c != "__g"],
            F.count(F.lit(1)).alias("n_groups"),
        ).collect()[0]
        N = tot["n"]
        G = int(tot["n_groups"])
        A = np.zeros((d, d))
        b = np.zeros(d)
        for i in range(d):
            for j in range(i, d):
                A[i, j] = A[j, i] = tot[f"xx_{i}_{j}"]
            b[i] = tot[f"xy_{i}"]
        beta_ols = np.linalg.solve(A, b)

        def components(beta_vec):
            """ANOVA method-of-moments variance components from the
            residuals of a given beta — per-group residual sums derive
            from the sufficient stats (sr_g = sy_g - sx_g.beta,
            srr_g = yy_g - 2 beta.xy_g + beta'XX_g beta), so each
            iteration re-aggregates `grp`, never the raw data."""
            bl = [float(v) for v in beta_vec]
            sr = F.col("sy")
            for i in range(d):
                sr = sr - F.lit(bl[i]) * F.col(f"sx_{i}")
            srr = F.col("yy")
            for i in range(d):
                srr = srr - 2.0 * F.lit(bl[i]) * F.col(f"xy_{i}")
            for i in range(d):
                for j in range(d):
                    srr = srr + F.lit(bl[i] * bl[j]) * F.col(
                        f"xx_{min(i,j)}_{max(i,j)}"
                    )
            mom = grp.select(
                F.col("n"), sr.alias("sr"), srr.alias("srr")
            ).agg(
                F.sum("srr").alias("ss_tot"),
                F.sum(F.col("sr") * F.col("sr") / F.col("n")).alias("ss_means"),
                F.sum(F.col("sr")).alias("sr_tot"),
                F.sum(F.col("n") * F.col("n")).alias("n2"),
            ).collect()[0]
            # SSW = sum(srr) - sum(sr^2/n); SSB = sum(sr^2/n)-(sum sr)^2/N
            ssw = mom["ss_tot"] - mom["ss_means"]
            ssb = mom["ss_means"] - mom["sr_tot"] ** 2 / N
            s2 = max(ssw / max(N - G, 1.0), 1e-12)
            n_bar = (N - mom["n2"] / N) / max(G - 1.0, 1.0)
            s2u = max((ssb / max(G - 1.0, 1.0) - s2) / max(n_bar, 1.0), 0.0)
            return s2, s2u

        def gls(lam_val):
            """Woodbury GLS normal equations, reduced over groups."""
            c_g = F.lit(lam_val) / (1.0 + F.col("n") * F.lit(lam_val))
            gls_aggs = []
            for i in range(d):
                for j in range(i, d):
                    gls_aggs.append(
                        F.sum(
                            F.col(f"xx_{i}_{j}")
                            - c_g * F.col(f"sx_{i}") * F.col(f"sx_{j}")
                        ).alias(f"a_{i}_{j}")
                    )
                gls_aggs.append(
                    F.sum(
                        F.col(f"xy_{i}") - c_g * F.col(f"sx_{i}") * F.col("sy")
                    ).alias(f"b_{i}")
                )
            g2 = grp.agg(*gls_aggs).collect()[0]
            A2 = np.zeros((d, d))
            b2 = np.zeros(d)
            for i in range(d):
                for j in range(i, d):
                    A2[i, j] = A2[j, i] = g2[f"a_{i}_{j}"]
                b2[i] = g2[f"b_{i}"]
            return np.linalg.solve(A2, b2)

        # ---- IGLS iteration: beta(lam) <-> components(beta).  Plain
        # MoM-on-OLS underestimates sigma2_u when group effects correlate
        # with group-mean x (confounding); iterating to the fixed point
        # recovers the within-group slope, like REML does.
        beta = beta_ols
        sigma2, sigma2_u = components(beta)
        lam = sigma2_u / sigma2
        for _ in range(20):
            beta = gls(lam)
            sigma2, sigma2_u = components(beta)
            new_lam = sigma2_u / sigma2
            if abs(new_lam - lam) <= 1e-6 * max(lam, 1.0):
                lam = new_lam
                break
            lam = new_lam
    finally:
        grp.unpersist()

    terms = ["intercept"] + xs
    rows = [(t, float(beta[i])) for i, t in enumerate(terms)]
    rows += [
        ("sigma2", float(sigma2)),
        ("sigma2_u", float(sigma2_u)),
        ("lambda", float(lam)),
        ("n_groups", float(G)),
        ("n_obs", float(N)),
    ]
    return df.sparkSession.createDataFrame(rows, "term string, value double")
