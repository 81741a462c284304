"""Corpus-trained bigram language-model scoring for quality filtering.

CCNet (Wenzek et al. 2020) and most production corpus builds score
documents with a small language model and drop the worst tail; the
standard tool is a KenLM n-gram model.  This module is the same idea
expressed relationally: train add-alpha-smoothed bigram statistics over
the corpus itself (or a reference corpus), then score every document by
its average per-token negative log-probability ("log-perplexity" —
lower = more natural text).

    P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V)
    nll(doc)   = -(1/T) * sum over bigrams ln P(w2 | w1)

Scale shape (two passes, both standard at 100 TB):

* ``train_bigram_lm`` — explode bigrams once, ONE groupBy to bigram
  counts; context counts and the vocab size V are aggregates OF the
  bigram counts (vocab-sized, not corpus-sized), so the corpus is read
  exactly once.
* ``score_documents`` — per-doc bigrams join the model.  The model is
  vocab-bounded (<< corpus); Spark's AQE broadcasts it when it fits,
  and the join key (ctx, nxt) is uniformly hash-distributed otherwise.
  Unseen bigrams fall back to the smoothed floor alpha/(c(ctx)+alpha*V)
  via a left join + coalesce, exactly as a backoff model would.

A BOS sentinel starts every document so the first real token is
conditioned too.  No UDFs; everything is codegen'd expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text

BOS = "<s>"


def _doc_bigrams(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, ctx, nxt) pairs — BOS-prefixed, built row-locally with a
    zip of the token array against itself shifted by one (no
    corpus-wide window, no shuffle)."""
    toks = df.select(
        F.col(id_col),
        F.split(normalize_text(text_col), " ").alias("tk"),
    ).where(F.size("tk") > 0)
    # ctx = BOS + tokens, truncated to T so both zip sides align exactly
    # (arrays_zip pads the shorter side with null otherwise)
    ctx = F.slice(
        F.concat(F.array(F.lit(BOS)), F.col("tk")), 1, F.size("tk")
    )
    pairs = toks.select(
        id_col,
        F.explode(
            F.arrays_zip(ctx.alias("ctx"), F.col("tk").alias("nxt"))
        ).alias("bg"),
    )
    return pairs.select(
        id_col, F.col("bg.ctx").alias("ctx"), F.col("bg.nxt").alias("nxt")
    )


def train_bigram_lm(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Bigram count table (ctx, nxt, c_bigram, c_ctx, vocab) — the
    sufficient statistics for smoothed scoring, derived from one corpus
    scan.  c_ctx and vocab are window/global aggregates of the
    vocab-sized count table, not of the corpus."""
    from pyspark.sql import Window

    bg = _doc_bigrams(df, id_col, text_col)
    counts = bg.groupBy("ctx", "nxt").agg(F.count("*").alias("c_bigram"))
    w = Window.partitionBy("ctx")
    counts = counts.withColumn("c_ctx", F.sum("c_bigram").over(w))
    vocab = counts.agg(
        F.countDistinct("nxt").alias("vocab")
    )
    return counts.crossJoin(F.broadcast(vocab))


def score_documents(
    df: DataFrame,
    model: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document (id, n_bigrams, avg_nll): average negative
    log-probability under the add-alpha bigram model.  With
    ``model=None`` the corpus scores itself (self-perplexity, the
    boilerplate/gibberish detector).

    Unseen context words have c_ctx unknown after the left join; they
    take the maximally smoothed floor ln(1/V) via coalesce(c_ctx, 0).
    """
    if model is None:
        model = train_bigram_lm(df, id_col=id_col, text_col=text_col)
    bg = _doc_bigrams(df, id_col, text_col)
    # context totals + vocab for contexts missing from the bigram table
    ctx_tbl = model.groupBy("ctx").agg(
        F.first("c_ctx").alias("c_ctx"), F.first("vocab").alias("vocab")
    )
    glob_v = model.agg(F.first("vocab").alias("g_vocab"))
    joined = (
        bg.join(
            model.select("ctx", "nxt", "c_bigram"), ["ctx", "nxt"], "left"
        )
        .join(ctx_tbl, "ctx", "left")
        .crossJoin(F.broadcast(glob_v))
    )
    v = F.coalesce(F.col("vocab"), F.col("g_vocab")).cast("double")
    num = F.coalesce(F.col("c_bigram"), F.lit(0)).cast("double") + alpha
    den = F.coalesce(F.col("c_ctx"), F.lit(0)).cast("double") + alpha * v
    nll = -F.log(num / den)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
        )
    )
