"""Linear text-quality classifier scoring (fastText / CCNet style).

The standard LLM corpus-quality gate (public method: Joulin et al. 2016
fastText linear classifiers; the CCNet and GPT-3 "quality classifier"
filters score documents with a linear model over bag-of-words features
and keep the high-scoring tail).  This module is the *deployment* path:
given a trained vocabulary->weight table (from fastText, sklearn,
or :func:`gofast_spark.ml.optim.gradient_descent` over extracted
features), score every document distributively.

score(doc) = sigmoid( bias + sum_t w[t] * tf(t, doc) )

with ``tf`` either the raw token count or count/len(doc) (``normalize=
'tf'``, the fastText default).  Unknown tokens contribute 0 — exactly a
sparse dot product against the model vocabulary.

Plan shape: the model is a small (vocab-sized) frame, **broadcast** into
one hash join against the exploded token counts; per-doc aggregation is
one keyed groupBy.  The corpus scans once; at 100 TB the only shuffle is
the per-doc sum (pre-aggregated map-side by (doc, token) counting being
row-local).  No Python UDF anywhere — sigmoid and the dot product are
codegen'd column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text


def linear_text_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float] | DataFrame,
    *,
    bias: float = 0.0,
    normalize: str = "tf",
    out_col: str = "score",
) -> DataFrame:
    """(id, n_tokens, dot, ``out_col``) — sigmoid linear score per doc.

    ``weights``: token -> weight dict (or a DataFrame with columns
    (token, weight)).  ``normalize='tf'`` divides token counts by doc
    length (fastText's mean-of-embeddings convention); ``'count'`` uses
    raw counts.  Empty docs score ``sigmoid(bias)``.
    """
    if normalize not in ("tf", "count"):
        raise ValueError(f"normalize must be 'tf' or 'count', got {normalize!r}")
    spark = df.sparkSession
    if isinstance(weights, dict):
        w = spark.createDataFrame(
            [(k, float(v)) for k, v in weights.items()],
            "token string, weight double",
        )
    else:
        w = weights.select("token", F.col("weight").cast("double"))
    # materialize the token array in its OWN projection before the
    # explode: putting `size(split(normalize(...)))` next to
    # `explode(split(normalize(...)))` in one select makes Spark
    # re-evaluate the normalize+split chain once per EXPLODED row
    # (token-count x regex work, a ~20x slowdown at sf0.1); with the
    # array as a named column referenced twice, it is computed once per
    # input row
    arr = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("__tk")
    )
    toks = arr.select(
        F.col(id_col),
        F.size("__tk").alias("__n_tok"),
        F.explode_outer("__tk").alias("token"),
    ).where(F.col("token").isNotNull())
    counts = toks.groupBy(id_col, "__n_tok", "token").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    hits = counts.join(F.broadcast(w), "token").groupBy(
        id_col, "__n_tok"
    ).agg(F.sum(F.col("__cnt") * F.col("weight")).alias("__dot_raw"))
    base = df.select(
        F.col(id_col),
        F.size(F.split(normalize_text(text_col), " ")).alias("n_tokens"),
    )
    out = base.join(hits, base[id_col] == hits[id_col], "left").select(
        base[id_col],
        "n_tokens",
        F.coalesce("__dot_raw", F.lit(0.0)).alias("__dot_raw"),
    )
    if normalize == "tf":
        dot = F.when(
            F.col("n_tokens") > 0, F.col("__dot_raw") / F.col("n_tokens")
        ).otherwise(F.lit(0.0))
    else:
        dot = F.col("__dot_raw")
    z = dot + F.lit(float(bias))
    return out.select(
        id_col,
        F.col("n_tokens").cast("bigint"),
        dot.alias("dot"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias(out_col),
    )


def quality_classifier_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float] | DataFrame,
    *,
    bias: float = 0.0,
    threshold: float = 0.5,
    normalize: str = "tf",
) -> DataFrame:
    """The corpus rows whose classifier score is >= ``threshold`` —
    the CCNet-style keep gate, preserving the input schema."""
    scores = linear_text_scores(
        df, id_col, text_col, weights, bias=bias, normalize=normalize
    ).where(F.col("score") >= F.lit(float(threshold)))
    return df.join(scores.select(id_col), id_col, "left_semi")
