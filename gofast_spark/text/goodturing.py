"""Good-Turing frequency-spectrum smoothing for corpus token counts.

Public basis: Good (Biometrika 1953); the log-linear smoothing is the
"Simple Good-Turing" recipe of Gale & Sampson (J. Quantitative
Linguistics 1995) — we implement their LGT (log-linear Good-Turing)
estimator: fit ``ln Z_r = a + b ln r`` by OLS over the spectrum and
smooth every count as ``r* = (r+1) (S(r+1)/S(r))`` with
``S(r) = exp(a + b ln r)``, which collapses to the closed form
``r* = (r+1) ((r+1)/r)^b`` — the intercept cancels.

Spark shape: ONE corpus-sized shuffle (token counts), then everything
is spectrum-sized (distinct count values — typically a few hundred
rows regardless of corpus size).  The OLS sums are quantized to exact
integer micro-units per term before aggregation (the repo's
deterministic-sum discipline), so the slope — and with it every
smoothed count — is bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text

__all__ = ["good_turing_spectrum"]


def _u6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("bigint")


def good_turing_spectrum(
    df: DataFrame,
    text_col: str,
    *,
    min_doc_len: int = 1,
) -> DataFrame:
    """Count-of-counts spectrum with Gale-Sampson smoothed counts and
    Good-Turing probabilities.

    Returns one row per observed count ``r``: ``(r, n_r, z_r, r_star,
    p_gt, p0)`` where ``n_r`` is the number of distinct tokens seen
    exactly ``r`` times, ``z_r`` the Church-Gale neighbor-averaged
    spectrum ``2 n_r / (t - q)``, ``r_star`` the LGT-smoothed count,
    ``p_gt = r_star / N`` the smoothed probability of ONE token with
    count ``r``, and ``p0 = n_1 / N`` the total unseen mass (constant
    column).
    """
    norm = normalize_text(text_col)
    toks = df.where(F.length(norm) >= min_doc_len).select(
        F.explode(F.split(norm, " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("r"))
    spec = counts.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))

    w = Window.orderBy("r")
    q = F.coalesce(F.lag("r").over(w), F.lit(0))
    t = F.coalesce(
        F.lead("r").over(w), F.lit(2) * F.col("r") - F.lag("r").over(w)
    )
    t = F.coalesce(t, F.lit(2) * F.col("r"))  # single-row spectrum: q=0
    zr = (
        F.lit(2.0)
        * F.col("n_r").cast("double")
        / (t - q).cast("double")
    )
    sz = spec.select(
        "r", "n_r", zr.alias("z_r"),
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(zr).alias("y"),
    )
    fit = sz.agg(
        F.count(F.lit(1)).alias("m"),
        (F.sum(_u6(F.col("x"))) / F.lit(1e6)).alias("sx"),
        (F.sum(_u6(F.col("y"))) / F.lit(1e6)).alias("sy"),
        (F.sum(_u6(F.col("x") * F.col("x"))) / F.lit(1e6)).alias("sxx"),
        (F.sum(_u6(F.col("x") * F.col("y"))) / F.lit(1e6)).alias("sxy"),
    ).select(
        (
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("b")
    )
    totals = spec.agg(
        F.sum(F.col("r") * F.col("n_r")).alias("n_tokens"),
        F.sum(F.when(F.col("r") == 1, F.col("n_r")).otherwise(0)).alias(
            "n1"
        ),
    )
    out = sz.crossJoin(F.broadcast(fit)).crossJoin(F.broadcast(totals))
    rs = (
        (F.col("r") + 1).cast("double")
        * F.pow(
            (F.col("r") + 1).cast("double") / F.col("r").cast("double"),
            F.col("b"),
        )
    )
    return out.select(
        "r",
        "n_r",
        "z_r",
        rs.alias("r_star"),
        (rs / F.col("n_tokens").cast("double")).alias("p_gt"),
        (
            F.col("n1").cast("double") / F.col("n_tokens").cast("double")
        ).alias("p0"),
    )


def heaps_law(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit ``V(N) = K * N^beta`` (Heaps
    1978; Herdan 1960) over a DETERMINISTICALLY SHUFFLED document
    order, so the curve measures the corpus, not its ingest order.

    Pipeline — nothing funnels through one reducer:

    1. per-doc token counts, shuffle key = portable md5 of the id;
    2. doc rank and cumulative token count via the two-phase
       distributed prefix scan (operators/prefix.py);
    3. each token's FIRST-occurrence rank from one (token -> min rank)
       aggregate over the distinct (doc, token) pairs;
    4. vocabulary size at each rank = prefix scan of the new-token
       counts, joined back to the token axis;
    5. log-log OLS with micro-unit-quantized term sums (the
       good_turing_spectrum recipe) -> ``beta`` = slope, ``k`` =
       exp(intercept).

    Returns ONE row ``(beta, k, n_docs, n_tokens, vocab)``.
    """
    from gofast_spark.operators.prefix import distributed_cumsum
    from gofast_spark.text.hashing import md5_hash64

    norm = normalize_text(text_col)
    base = df.where(F.length(norm) > 0).select(
        F.col(id_col).alias("__id"),
        F.split(norm, " ").alias("tk"),
        md5_hash64(F.col(id_col).cast("string")).alias("__shuf"),
    )
    docs = base.select(
        "__id", "__shuf", F.size("tk").alias("__nt"), "tk"
    )
    with_one = docs.withColumn("__one", F.lit(1))
    ranked = distributed_cumsum(
        with_one, ["__shuf", "__id"], "__one", out_col="__r"
    )
    ranked = distributed_cumsum(
        ranked, ["__shuf", "__id"], "__nt", out_col="__cumtok"
    ).select("__id", "__r", "__cumtok", "tk")
    first = (
        ranked.select("__r", F.explode(F.array_distinct("tk")).alias("w"))
        .groupBy("w")
        .agg(F.min("__r").alias("__fr"))
        .groupBy("__fr")
        .agg(F.count(F.lit(1)).alias("__new"))
    )
    axis = ranked.select("__r", "__cumtok").join(
        first, ranked["__r"] == first["__fr"], "left"
    ).select(
        "__r", "__cumtok", F.coalesce("__new", F.lit(0)).alias("__new")
    )
    axis = distributed_cumsum(axis, ["__r"], "__new", out_col="__vocab")
    pts = axis.select(
        F.log(F.col("__cumtok").cast("double")).alias("x"),
        F.log(F.col("__vocab").cast("double")).alias("y"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("m"),
        (F.sum(_u6(F.col("x"))) / F.lit(1e6)).alias("sx"),
        (F.sum(_u6(F.col("y"))) / F.lit(1e6)).alias("sy"),
        (F.sum(_u6(F.col("x") * F.col("x"))) / F.lit(1e6)).alias("sxx"),
        (F.sum(_u6(F.col("x") * F.col("y"))) / F.lit(1e6)).alias("sxy"),
    )
    tot = axis.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("__cumtok").alias("n_tokens"),
        F.max("__vocab").alias("vocab"),
    )
    beta = (
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return fit.crossJoin(F.broadcast(tot)).select(
        beta.alias("beta"),
        F.exp((F.col("sy") - beta * F.col("sx")) / F.col("m")).alias("k"),
        "n_docs",
        "n_tokens",
        "vocab",
    )
