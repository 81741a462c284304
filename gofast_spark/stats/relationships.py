"""Relationship analysis (SURVEY §2.10): rank correlations, rank-based
tests, thresholded correlation extraction.

Reference: ``correlation`` (gofast/stats/relationships.py:32),
``optimized_spearmanr`` (gofast/utils/mathext.py:3063),
``kruskal_wallis_test`` (gofast/stats/inferential.py:1039),
``correlation_ops`` (gofast/dataops/quality.py:3845).

Rank assignment uses average ranks (scipy convention) built as
distinct-value cumulative midranks (the ks_test_2samp pattern): rows are
aggregated per distinct value first (map-side partial combine), the
cumulative count runs over the small distinct-value frame, and midranks
join back on the value — never a full-table single-reducer rank sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _midrank_map(df: DataFrame, col: Column) -> DataFrame:
    """(``__v``, ``__mr``): every distinct value of ``col`` with its
    average (mid)rank over the whole frame — for a value with ``c`` ties
    preceded by ``B`` smaller items, ranks span B+1..B+c, so the midrank
    is ``B + (c+1)/2``.  The cumulative-sum window runs over the
    *distinct-value* frame, keeping the sorted set small at scale;
    continuous keys are bounded by the callers' ``bins=`` quantile-sketch
    pre-binning (stats.prebin).  If an UNBINNED continuous-key path were
    ever needed at extreme scale, swap this window for the two-phase
    parallel scan in :func:`gofast_spark.operators.prefix.
    distributed_cumsum` — the counts are integer-valued doubles, so the
    regrouped additions stay bit-exact."""
    per_val = df.groupBy(col.alias("__v")).agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum("__c").over(w), F.lit(0.0))
    return per_val.select(
        "__v", (before + (F.col("__c") + 1) / 2.0).alias("__mr")
    )


def spearman_corr(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    bins: int | str | None = "auto",
    relative_error: float = 1e-4,
) -> DataFrame:
    """Spearman rho = Pearson correlation of average ranks
    (optimized_spearmanr, gofast/utils/mathext.py:3063).  Midrank maps
    (distinct-value frames) join back to the rows on the value — two
    hash joins on high-cardinality keys, no global rank sort.

    ``bins`` bounds the distinct-value frames on continuous columns via
    a quantile sketch (stats.prebin): exact whenever a column's distinct
    count <= bins (discrete data pays nothing), approximate at 1/bins
    distribution resolution above it — the 100-TB path for continuous
    doubles where distinct ~= N."""
    from gofast_spark.stats.prebin import prebin_column

    df = prebin_column(df, col_a, bins=bins, relative_error=relative_error)
    df = prebin_column(df, col_b, bins=bins, relative_error=relative_error)
    ma = _midrank_map(df, F.col(col_a)).withColumnsRenamed(
        {"__v": "__va", "__mr": "__ra"}
    )
    mb = _midrank_map(df, F.col(col_b)).withColumnsRenamed(
        {"__v": "__vb", "__mr": "__rb"}
    )
    ranked = df.join(ma, F.col(col_a).eqNullSafe(F.col("__va"))).join(
        mb, F.col(col_b).eqNullSafe(F.col("__vb"))
    )
    return ranked.agg(F.corr("__ra", "__rb").alias("spearman"))


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    bins: int | str | None = "auto",
    relative_error: float = 1e-4,
) -> DataFrame:
    """Kruskal-Wallis H (no tie correction; document when data is heavily
    tied) from per-group rank sums:
    ``H = 12/(N(N+1)) * sum(R_g^2 / n_g) - 3(N+1)``
    (gofast/stats/inferential.py:1039).

    Scale shape: rows aggregate to (value, group) counts first, the
    midrank map joins on the value, and rank sums are
    ``sum(midrank * count)`` — no per-row rank window.  ``bins`` bounds
    the distinct-value frame on continuous values (stats.prebin; exact
    when distinct <= bins)."""
    from gofast_spark.stats.prebin import prebin_column

    df = prebin_column(df, value_col, bins=bins, relative_error=relative_error)
    pairs = df.groupBy(
        F.col(value_col).alias("__pv"), F.col(group_col).alias("__g")
    ).agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
    mr = _midrank_map(df, F.col(value_col))
    per_g = (
        pairs.join(mr, F.col("__pv").eqNullSafe(F.col("__v")))
        .groupBy("__g")
        .agg(
            F.sum(F.col("__mr") * F.col("__cnt")).alias("rsum"),
            F.sum("__cnt").cast("bigint").alias("n"),
        )
    )
    stats = per_g.agg(
        F.sum(F.col("rsum") * F.col("rsum") / F.col("n")).alias("s"),
        F.sum("n").alias("N"),
        F.count(F.lit(1)).alias("k"),
    )
    h = 12.0 / (F.col("N") * (F.col("N") + 1)) * F.col("s") - 3.0 * (F.col("N") + 1)
    return stats.select(
        h.alias("h_stat"),
        (F.col("k") - 1).cast("bigint").alias("dof"),
        F.col("N").cast("bigint").alias("n"),
    )


def correlation_ops(
    df: DataFrame,
    columns: Sequence[str],
    *,
    threshold: float = 0.5,
    op: str = "strong",
) -> DataFrame:
    """Extract correlated pairs above/below a threshold from the one-pass
    correlation matrix (correlation_ops, gofast/dataops/quality.py:3845).

    op='strong' keeps |corr| >= threshold; 'weak' keeps |corr| <
    threshold.
    """
    from gofast_spark.stats.descriptive import corr_matrix

    m = corr_matrix(df, columns)
    a = F.abs(F.col("corr"))
    if op == "strong":
        return m.where(a >= threshold)
    if op == "weak":
        return m.where(a < threshold)
    raise ValueError(f"unsupported op {op!r}")


def categorical_association(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Association measures between two categorical columns in one pass:
    Pearson chi-square, Cramer's V (chi2 normalized to [0,1] by
    ``n * (min(r,c)-1)``, Cramer 1946), and mutual information in nats
    (the feature-selection score; Cover & Thomas ch. 2).

    Scale shape: the contingency table is ONE groupBy (category-pair
    sized, never row-sized); marginals are two aggregates OF that
    table; expected counts and the three statistics are a broadcast
    join + one final sum over the pair table.  Null categories are
    excluded (pairwise deletion)."""
    a, b = F.col(col_a), F.col(col_b)
    base = df.where(a.isNotNull() & b.isNotNull())
    joint = base.groupBy(
        a.alias("__a"), b.alias("__b")
    ).agg(F.count(F.lit(1)).alias("n_ab"))
    ma = joint.groupBy("__a").agg(F.sum("n_ab").alias("n_a"))
    mb = joint.groupBy("__b").agg(F.sum("n_ab").alias("n_b"))
    tot = joint.agg(
        F.sum("n_ab").alias("n"),
        F.count_distinct("__a").alias("r"),
        F.count_distinct("__b").alias("c"),
    )
    e = (F.col("n_a").cast("double") * F.col("n_b")) / F.col("n")
    t = (
        joint.join(F.broadcast(ma), "__a")
        .join(F.broadcast(mb), "__b")
        .crossJoin(F.broadcast(tot))
    )
    return t.agg(
        F.sum(F.pow(F.col("n_ab") - e, 2) / e).alias("chi2"),
        F.sum(
            (F.col("n_ab") / F.col("n").cast("double"))
            * F.log(
                (F.col("n_ab").cast("double") * F.col("n"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            )
        ).alias("mutual_info"),
        F.sqrt(
            F.sum(F.pow(F.col("n_ab") - e, 2) / e)
            / (
                F.first("n").cast("double")
                * (F.least(F.first("r"), F.first("c")) - 1)
            )
        ).alias("cramers_v"),
        F.first("n").alias("n"),
        F.first("r").cast("int").alias("r"),
        F.first("c").cast("int").alias("c"),
    )


def kendall_tau(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    bins: int | str | None = "auto",
    relative_error: float = 1e-4,
) -> DataFrame:
    """Kendall's tau-b rank correlation with tie correction (Kendall,
    Biometrika 1938; tau-b per Agresti, "Analysis of Ordinal
    Categorical Data"):

        tau_b = (C - D) / sqrt((n0 - n1) (n0 - n2))

    with C/D the concordant/discordant pair counts and n1/n2 the
    x-/y-marginal tie terms.

    Scale shape: the naive pair enumeration is quadratic in ROWS; here
    rows first fold into a (x, y) contingency grid (``bins`` bounds
    both columns via stats.prebin — exact when distinct <= bins, the
    spearman discipline), the grid is densified by a broadcast
    cross of the two distinct-value frames, and C/D come from 2-D
    prefix sums — two cumulative window passes over the grid, each
    PARTITIONED by one axis.  Everything is an exact integer until the
    final division (pair counts widened to decimal so N(N-1)/2 never
    overflows).  Returns ``(tau_b, concordant, discordant, n)``."""
    from gofast_spark.stats.prebin import prebin_column

    df = df.where(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
    df = prebin_column(df, col_x, bins=bins, relative_error=relative_error)
    df = prebin_column(df, col_y, bins=bins, relative_error=relative_error)
    cells = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    xs = cells.select("x").distinct()
    ys = cells.select("y").distinct()
    grid = (
        xs.crossJoin(F.broadcast(ys))
        .join(cells, ["x", "y"], "left")
        .select("x", "y", F.coalesce(F.col("cnt"), F.lit(0)).alias("n"))
    )
    # A(x,y) = sum over x' < x of n(x', y): cumulative along x per y
    w_x = (
        Window.partitionBy("y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g1 = grid.withColumn(
        "a", F.coalesce(F.sum("n").over(w_x), F.lit(0))
    )
    # S(x,y)  = sum over y' < y  of A(x,y')  (strictly less in both)
    # B(x,y)  = sum over y' <= y of A(x,y')  (less in x, leq in y)
    # T(x)    = sum over all y   of A(x,y)   (less in x, any y)
    w_y_lt = (
        Window.partitionBy("x")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_y_le = (
        Window.partitionBy("x")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_t = Window.partitionBy("x")
    g2 = g1.select(
        "x",
        "y",
        "n",
        F.coalesce(F.sum("a").over(w_y_lt), F.lit(0)).alias("s_ll"),
        F.sum("a").over(w_y_le).alias("b_lle"),
        F.sum("a").over(w_t).alias("t_l"),
    )
    pair_sums = g2.agg(
        F.sum(
            F.col("n").cast("decimal(19,0)") * F.col("s_ll")
        ).alias("concordant"),
        F.sum(
            F.col("n").cast("decimal(19,0)")
            * (F.col("t_l") - F.col("b_lle"))
        ).alias("discordant"),
    )
    margins_x = cells.groupBy("x").agg(F.sum("cnt").alias("tx")).agg(
        F.sum(
            F.col("tx").cast("decimal(19,0)") * (F.col("tx") - 1)
        ).alias("tie_x2"),
        F.sum("tx").alias("n_rows"),
    )
    margins_y = cells.groupBy("y").agg(F.sum("cnt").alias("ty")).agg(
        F.sum(
            F.col("ty").cast("decimal(19,0)") * (F.col("ty") - 1)
        ).alias("tie_y2"),
    )
    j = pair_sums.crossJoin(F.broadcast(margins_x)).crossJoin(
        F.broadcast(margins_y)
    )
    n = F.col("n_rows").cast("decimal(19,0)")
    n0_2 = n * (n - 1)  # 2*n0
    c = F.col("concordant").cast("double")
    d = F.col("discordant").cast("double")
    denom = F.sqrt(
        (n0_2 - F.col("tie_x2")).cast("double")
        * (n0_2 - F.col("tie_y2")).cast("double")
    ) / F.lit(2.0)
    # companion ordinal-association measures from the same C/D pass
    # (Goodman & Kruskal, JASA 1954; Somers, ASR 1962): gamma ignores
    # all ties; Somers' D conditions on pairs untied in one variable.
    gamma = (c - d) / (c + d)
    somers_yx = (c - d) / ((n0_2 - F.col("tie_x2")).cast("double") / F.lit(2.0))
    somers_xy = (c - d) / ((n0_2 - F.col("tie_y2")).cast("double") / F.lit(2.0))
    return j.select(
        ((c - d) / denom).alias("tau_b"),
        gamma.alias("gamma"),
        somers_yx.alias("somers_yx"),
        somers_xy.alias("somers_xy"),
        F.col("concordant").cast("bigint").alias("concordant"),
        F.col("discordant").cast("bigint").alias("discordant"),
        F.col("n_rows").alias("n"),
    )


def partial_corr(
    df: DataFrame,
    col_x: str,
    col_y: str,
    col_z: str,
) -> DataFrame:
    """First-order partial correlation ``r_xy.z`` (the textbook
    recursion, e.g. Kendall & Stuart):

        r_xy.z = (r_xy - r_xz r_yz) / sqrt((1 - r_xz^2)(1 - r_yz^2))

    with every Pearson r computed from exact milli-unit integer
    moments in ONE aggregate — all six sums decimal-widened, so the
    three correlations (and the partial) are deterministic functions
    of integers.  Returns one row ``(partial_corr, r_xy, r_xz, r_yz,
    n)``."""
    cols = [col_x, col_y, col_z]
    q = {
        c: F.floor(F.col(c).cast("double") * 1e3 + F.lit(0.5)).cast(
            "bigint"
        )
        for c in cols
    }
    base = df.where(
        F.col(col_x).isNotNull()
        & F.col(col_y).isNotNull()
        & F.col(col_z).isNotNull()
    ).select(
        q[col_x].alias("x"), q[col_y].alias("y"), q[col_z].alias("z")
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("z") * F.col("z")).alias("szz"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("z")).alias("sxz"),
        F.sum(dec("y") * F.col("z")).alias("syz"),
    )
    n = F.col("n").cast("double")

    def r(sab, sa, sb, saa, sbb):
        num = n * F.col(sab).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sb).cast("double")
        da = n * F.col(saa).cast("double") - F.col(sa).cast(
            "double"
        ) * F.col(sa).cast("double")
        db = n * F.col(sbb).cast("double") - F.col(sb).cast(
            "double"
        ) * F.col(sb).cast("double")
        return num / F.sqrt(da * db)

    r_xy = r("sxy", "sx", "sy", "sxx", "syy")
    r_xz = r("sxz", "sx", "sz", "sxx", "szz")
    r_yz = r("syz", "sy", "sz", "syy", "szz")
    partial = (r_xy - r_xz * r_yz) / F.sqrt(
        (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
    )
    return agg.select(
        partial.alias("partial_corr"),
        r_xy.alias("r_xy"),
        r_xz.alias("r_xz"),
        r_yz.alias("r_yz"),
        F.col("n"),
    )


def cliffs_delta(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Cliff's delta ordinal effect size (Cliff, Psychological
    Bulletin 1993): ``delta = (#(a > b) - #(a < b)) / (n_a n_b)`` over
    all cross-group pairs — the tie-aware, distribution-free companion
    to Cohen's d (stats cohens_d entry).

    Pair counts come from the pooled distinct-value frame: one
    groupBy(value) with per-group conditional counts, one cumulative
    window, and decimal-widened products — exact integers until the
    final division (the ks_test_2samp shape; never a row-level pair
    join).  Returns one row ``(delta, n_greater, n_less, n_a, n_b)``."""
    x = F.col(value_col)
    in_a = (F.col(group_col) == group_a).cast("long")
    in_b = (F.col(group_col) == group_b).cast("long")
    per = (
        df.where(
            x.isNotNull() & F.col(group_col).isin([group_a, group_b])
        )
        .groupBy(x.alias("v"))
        .agg(F.sum(in_a).alias("ca"), F.sum(in_b).alias("cb"))
    )
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    t = per.select(
        "ca",
        "cb",
        F.coalesce(F.sum("cb").over(w_prev), F.lit(0)).alias("cb_lt"),
        F.sum("cb").over(tot).alias("cb_tot"),
    )
    agg = t.agg(
        F.sum(F.col("ca").cast("decimal(19,0)") * F.col("cb_lt")).alias(
            "n_greater"
        ),
        F.sum(
            F.col("ca").cast("decimal(19,0)")
            * (F.col("cb_tot") - F.col("cb_lt") - F.col("cb"))
        ).alias("n_less"),
        F.sum("ca").alias("n_a"),
        F.max("cb_tot").alias("n_b"),
    )
    delta = (
        (F.col("n_greater") - F.col("n_less")).cast("double")
        / (
            F.col("n_a").cast("double") * F.col("n_b").cast("double")
        )
    )
    return agg.select(
        delta.alias("delta"),
        F.col("n_greater").cast("bigint").alias("n_greater"),
        F.col("n_less").cast("bigint").alias("n_less"),
        F.col("n_a"),
        F.col("n_b"),
    )


def point_biserial(
    df: DataFrame,
    value_col: str,
    indicator: Column,
    *,
    quantize: int = 100,
) -> DataFrame:
    """Point-biserial correlation between a binary indicator and a
    numeric column — the Pearson r specialization the reference's
    ``correlation`` dispatches to for dichotomous/continuous pairs
    (gofast/stats/relationships.py:32; Tate, Ann. Math. Statist. 1954).

    One aggregate of INTEGER sufficient statistics: the value is
    quantized to ``1/quantize`` units (exact for money domains), the
    indicator contributes integer counts and conditional sums, squares
    are decimal-widened, and the single Pearson closed form

        r = (n*Sxy - Sx*n1) / sqrt((n*Sxx - Sx^2) * n1 * (n - n1))

    runs in double over a handful of exact integers — deterministic
    across engines and summation orders.  Rows with a NULL value or
    indicator are excluded."""
    x = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quantize)) + F.lit(0.5)
    ).cast("bigint")
    ind = indicator.cast("int")
    base = df.where(F.col(value_col).isNotNull() & ind.isNotNull())
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ind).alias("n1"),
        F.sum(x.cast("decimal(19,0)")).alias("sx"),
        F.sum(x.cast("decimal(19,0)") * x).alias("sxx"),
        F.sum(F.when(ind == 1, x).otherwise(F.lit(0)).cast("decimal(19,0)")).alias(
            "sxy"
        ),
    )
    n = F.col("n").cast("decimal(38,0)")
    n1 = F.col("n1").cast("decimal(38,0)")
    num = (n * F.col("sxy") - F.col("sx") * n1).cast("double")
    den_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (n * n1 - n1 * n1).cast("double")
    return agg.select(
        (num / F.sqrt(den_x * den_y)).alias("r_pb"),
        F.col("n").cast("bigint").alias("n"),
        F.col("n1").cast("bigint").alias("n1"),
    )


def rank_biserial(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    bins: int | str | None = "auto",
) -> DataFrame:
    """Rank-biserial correlation (Cureton 1956; Wendt 1972's simple
    difference formula) — the effect-size companion of the
    Mann-Whitney U test, as Cliff's delta is of the dominance count:

        r_rb = (U_a - U_b) / (n_a * n_b)  =  1 - 2*U_b / (n_a * n_b)

    Rides :func:`gofast_spark.stats.inferential.mann_whitney_u`'s
    distinct-value midrank machinery unchanged (one groupBy + one
    small-frame cumulative window, never a full-table rank sort), so
    its tie handling and scale shape are inherited verbatim."""
    from gofast_spark.stats.inferential import mann_whitney_u

    u = mann_whitney_u(
        df, value_col, group_col, group_a, group_b, bins=bins
    )
    r = (F.col("u_a") - F.col("u_b")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return u.select(
        r.alias("r_rb"),
        F.col("u_a"),
        F.col("u_b"),
        F.col("n_a"),
        F.col("n_b"),
    )


def vif_three(
    df: DataFrame,
    cols: Sequence[str],
    *,
    quantize: Sequence[int] = (1, 100, 100),
) -> DataFrame:
    """Variance inflation factors for THREE regressors via the
    closed-form inverse of their 3x3 correlation matrix (the
    multicollinearity screen of the reference's model-diagnostics
    family; Belsley-Kuh-Welsch 1980):

        VIF_i = [R^{-1}]_ii,   e.g. VIF_1 = (1 - r23^2) / det(R)
        det(R) = 1 + 2 r12 r13 r23 - r12^2 - r13^2 - r23^2

    ONE aggregate collects the nine integer moments (each column
    quantized per ``quantize``; squares and cross-products decimal
    -widened so sums commute); every correlation and VIF is a closed
    -form double over them.  Returns one row ``(r12, r13, r23,
    det_r, vif_1, vif_2, vif_3, n)``."""
    if len(cols) != 3 or len(quantize) != 3:
        raise ValueError("vif_three needs exactly three columns and quantizers")
    q = [
        F.floor(
            F.col(c).cast("double") * F.lit(float(k)) + F.lit(0.5)
        ).cast("bigint")
        for c, k in zip(cols, quantize)
    ]
    base = df.where(
        F.col(cols[0]).isNotNull()
        & F.col(cols[1]).isNotNull()
        & F.col(cols[2]).isNotNull()
    ).select(
        q[0].alias("__x1"), q[1].alias("__x2"), q[2].alias("__x3")
    )

    def d(c):
        return F.col(c).cast("decimal(19,0)")

    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("__x1")).alias("s1"),
        F.sum(d("__x2")).alias("s2"),
        F.sum(d("__x3")).alias("s3"),
        F.sum(d("__x1") * F.col("__x1")).alias("s11"),
        F.sum(d("__x2") * F.col("__x2")).alias("s22"),
        F.sum(d("__x3") * F.col("__x3")).alias("s33"),
        F.sum(d("__x1") * F.col("__x2")).alias("s12"),
        F.sum(d("__x1") * F.col("__x3")).alias("s13"),
        F.sum(d("__x2") * F.col("__x3")).alias("s23"),
    )
    n = F.col("n").cast("decimal(38,0)")

    def corr(sab, sa, sb, saa, sbb):
        num = (n * sab - sa * sb).cast("double")
        da = (n * saa - sa * sa).cast("double")
        db = (n * sbb - sb * sb).cast("double")
        return num / F.sqrt(da * db)

    r12 = corr(F.col("s12"), F.col("s1"), F.col("s2"), F.col("s11"), F.col("s22"))
    r13 = corr(F.col("s13"), F.col("s1"), F.col("s3"), F.col("s11"), F.col("s33"))
    r23 = corr(F.col("s23"), F.col("s2"), F.col("s3"), F.col("s22"), F.col("s33"))
    det = (
        1.0
        + 2.0 * r12 * r13 * r23
        - r12 * r12
        - r13 * r13
        - r23 * r23
    )
    return agg.select(
        r12.alias("r12"),
        r13.alias("r13"),
        r23.alias("r23"),
        det.alias("det_r"),
        ((1.0 - r23 * r23) / det).alias("vif_1"),
        ((1.0 - r13 * r13) / det).alias("vif_2"),
        ((1.0 - r12 * r12) / det).alias("vif_3"),
        F.col("n").cast("bigint").alias("n"),
    )
