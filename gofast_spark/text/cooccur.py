"""Pointwise-mutual-information phrase mining over adjacent token pairs.

PMI(x, y) = ln( p(x,y) / (p(x) p(y)) ) with p(x,y) from adjacent-bigram
counts and p(x) from unigram counts (Church & Hanks 1990; the same score
word2vec's phrase pass thresholds on, Mikolov et al. 2013).  High-PMI
adjacent pairs are collocations ("new york", "machine learning") — the
standard pre-tokenization phrase-detection signal for training corpora.

Scale shape: bigrams and unigrams are each ONE explode + groupBy (the
count tables are vocab-sized, not corpus-sized); the two totals ride a
1-row broadcast; the unigram probabilities join back into the pair
table twice, broadcast-gated on vocabulary size.  Top-k is
TakeOrderedAndProject on the ROUNDED score so tie order is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_k: int = 50,
    broadcast_limit: int | None = 500_000,
) -> DataFrame:
    """Top-``top_k`` adjacent pairs by PMI: ``(w1, w2, n_pair, pmi)``.

    ``min_count`` drops rare pairs (PMI is noise-dominated at tiny
    counts — the Church & Hanks caveat); ``broadcast_limit`` gates the
    unigram-table broadcast exactly like the other dedup/scaling
    operators (above it the joins shuffle and AQE decides)."""
    # filter on the NORMALIZED string, not size(tk): split('') returns
    # [''] (size 1), so a size guard never fires and an empty/whitespace
    # -only document would contribute a '' unigram and inflate n_tokens
    # (diverging from the oracle's WHERE len(t) > 0)
    norm = normalize_text(text_col)
    toks = df.where(F.length(norm) > 0).select(
        F.split(norm, " ").alias("tk")
    )

    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # Materialize both vocab-sized count tables ONCE (guide §1.2/§2.4:
    # remove repeated passes): without the checkpoint, the broadcast
    # -gate count() job, the totals aggregate, and the scoring join each
    # re-ran the corpus explode + groupBy chain — 3 extra corpus scans
    # for frames that are vocabulary-sized.
    pair_counts = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .localCheckpoint(eager=True)
    )

    from pyspark.sql import Observation

    obs = Observation()
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # r16: the gate count rides the checkpoint as an observed metric
    if broadcast_limit is None or obs.get["n"] <= broadcast_limit:
        uni = F.broadcast(uni)

    # both totals from the materialized count tables: sum(n_w) over the
    # unigram table == sum(size(tk)) and sum(n_pair) over the bigram
    # table == sum(size(tk) - 1) — exact integer identities, no third
    # corpus scan
    totals = uni.agg(F.sum("n_w").alias("n_tokens")).crossJoin(
        F.broadcast(pair_counts.agg(F.sum("n_pair").alias("m_pairs")))
    )

    scored = (
        pair_counts.where(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            # double from the FIRST multiply (left-assoc promotion) —
            # pure-int64 products overflow at corpus scale, and the
            # oracle replays the identical promotion order
            F.round(
                F.log(
                    (
                        F.col("n_pair").cast("double")
                        * F.col("n_tokens")
                        * F.col("n_tokens")
                    )
                    / (
                        F.col("m_pairs").cast("double")
                        * F.col("n1")
                        * F.col("n2")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("n_pair").desc(), "w1", "w2"
    ).limit(top_k)


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_v: int = 500,
) -> DataFrame:
    """Zipf's-law fit of the corpus frequency spectrum: OLS slope of
    ``ln(freq) ~ ln(rank)`` over the ``top_v`` most frequent tokens
    (Zipf 1949; a healthy natural-language corpus sits near -1, and
    the deviation is a cheap corpus-quality fingerprint — template
    spam flattens the head, boilerplate dedup failures steepen it).

    Returns 1 row ``(slope, intercept, n_terms, n_tokens)``.  One
    explode + vocab groupBy (the bigram_pmi scan shape), a
    deterministic (count DESC, token) rank over the top-``top_v``
    slice, and a closed-form 2x2 OLS from one aggregate of that tiny
    frame."""
    norm = normalize_text(text_col)
    toks = df.where(F.length(norm) > 0).select(
        F.split(norm, " ").alias("tk")
    )
    counts = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    total = counts.agg(F.sum("n_w").alias("__n_tokens"))
    from pyspark.sql import Window

    head = counts.orderBy(F.col("n_w").desc(), "w").limit(top_v)
    ranked = head.withColumn(
        "__r",
        F.row_number().over(Window.orderBy(F.col("n_w").desc(), "w")),
    )
    x = F.log(F.col("__r").cast("double"))
    y = F.log(F.col("n_w").cast("double"))
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return m.crossJoin(F.broadcast(total)).select(
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
            "intercept"
        ),
        F.col("n").cast("bigint").alias("n_terms"),
        F.col("__n_tokens").cast("bigint").alias("n_tokens"),
    )


def llr_collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_k: int = 50,
    broadcast_limit: int | None = 500_000,
) -> DataFrame:
    """Top-``top_k`` adjacent pairs by Dunning's log-likelihood ratio
    (Dunning, Computational Linguistics 1993) — the count-robust
    collocation score that, unlike PMI, does not explode on rare pairs:

        G2 = 2 * sum_ij k_ij * ln( k_ij * N / (R_i * C_j) )

    over the 2x2 contingency of (first word = w1?) x (second word =
    w2?), with ``0 * ln 0 = 0``.  Every margin derives from the ONE
    bigram count table (first-/second-position counts are vocab-sized
    groupBys of it and N is its 1-row sum) — a single corpus explode
    feeds everything.  Products promote to double from the first
    multiply so int64 never overflows at corpus scale; the score is
    rounded to 6 for engine-stable top-k ties."""
    norm = normalize_text(text_col)
    toks = df.where(F.length(norm) > 0).select(
        F.split(norm, " ").alias("tk")
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # one corpus explode EVER: the bigram count table feeds the margins,
    # the total, the gate count and the scoring join — materialize it
    # once (guide §2.4; the gate's count() otherwise re-executes the
    # whole explode chain and the main plan re-runs it per consumer)
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    obs = Observation()
    # r16: the gate count used to re-execute the w1-margin aggregate
    # (count + join = 2 passes over pc); the margin is now pinned once
    # with the count as an observed metric of its materialization
    first = (
        pc.groupBy("w1").agg(F.sum("n_pair").alias("r1"))
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    second = pc.groupBy("w2").agg(F.sum("n_pair").alias("c1"))
    total = pc.agg(F.sum("n_pair").alias("nn"))
    # same vocabulary-size broadcast gate as bigram_pmi: above the limit
    # the margin joins shuffle and AQE decides
    if broadcast_limit is None or obs.get["n"] <= broadcast_limit:
        first, second = F.broadcast(first), F.broadcast(second)

    j = (
        pc.where(F.col("n_pair") >= min_count)
        .join(first, "w1")
        .join(second, "w2")
        .crossJoin(F.broadcast(total))
    )

    def term(k, r, c):
        # k * ln(k*N / (r*c)), double from the first multiply
        return F.when(
            k > 0,
            k.cast("double")
            * F.log(k.cast("double") * F.col("nn") / (r.cast("double") * c)),
        ).otherwise(F.lit(0.0))

    k11 = F.col("n_pair")
    k12 = F.col("r1") - k11
    k21 = F.col("c1") - k11
    k22 = F.col("nn") - F.col("r1") - F.col("c1") + k11
    r2 = F.col("nn") - F.col("r1")
    c2 = F.col("nn") - F.col("c1")
    g2 = F.lit(2.0) * (
        term(k11, F.col("r1"), F.col("c1"))
        + term(k12, F.col("r1"), c2)
        + term(k21, r2, F.col("c1"))
        + term(k22, r2, c2)
    )
    scored = j.select(
        "w1", "w2", "n_pair", F.round(g2, 6).alias("llr")
    )
    return scored.orderBy(
        F.col("llr").desc(), F.col("n_pair").desc(), "w1", "w2"
    ).limit(top_k)


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    holdout_mod: int = 5,
) -> DataFrame:
    """Bigram novelty of a held-out document split against the rest of
    the corpus — the train/test contamination-and-memorization screen
    a training-data pipeline runs before evaluation splits are trusted
    (complementing the catalog's contamination_check and dedup
    families): the fraction of held-out bigram TYPES (and token
    OCCURRENCES) never seen in the training split.

    One tokenize pass, two distinct bigram tables, one left-anti join
    — the train side is the big one and is only ever distinct-reduced,
    never collected.  All outputs are integer counts and their single
    -division ratios.  Returns ONE row ``(n_train_types, n_test_types,
    novel_types, type_novelty, test_occurrences, novel_occurrences,
    occurrence_novelty)``."""
    norm = normalize_text(text_col)
    base = df.where(
        F.col(id_col).isNotNull() & (F.length(norm) > 0)
    ).select(F.col(id_col).alias("id"), F.split(norm, " ").alias("tk"))

    def bigrams(d: DataFrame) -> DataFrame:
        return d.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
                    F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
                )
            ).alias("bg")
        ).select(
            F.concat(
                F.col("bg.w1"), F.lit("|"), F.col("bg.w2")
            ).alias("bg")
        )

    # one tokenize pass per split (guide §1.2): the five readouts below
    # previously each re-executed their corpus lineage (train distinct
    # 3x, test explode 3x).  The test side folds to a (type, n_occ)
    # count table first — type/occurrence novelty then read off ONE
    # anti-join of vocabulary-sized frames: count(novel types) and
    # sum(their occurrence counts) are the same integers as the old
    # per-occurrence anti-join by definition of the grouping.
    # r16: all five scalar readouts ride the three checkpoint
    # materializations as observed metrics — zero separate driver
    # actions (they were 5: three counts + two sum collects)
    from pyspark.sql import Observation

    obs_train, obs_test, obs_novel = Observation(), Observation(), Observation()
    train_set = (
        bigrams(base.where(F.col("id") % holdout_mod != 0))
        .distinct()
        .observe(obs_train, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    test_cnt = (
        bigrams(base.where(F.col("id") % holdout_mod == 0))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("__n"))
        .observe(
            obs_test,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("__n"), F.lit(0)).alias("occ"),
        )
        .localCheckpoint(eager=True)
    )
    novel_cnt = (
        test_cnt.join(train_set, "bg", "left_anti")
        .observe(
            obs_novel,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("__n"), F.lit(0)).alias("occ"),
        )
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    n_train = obs_train.get["n"]
    n_test = obs_test.get["n"]
    n_novel = obs_novel.get["n"]
    occ_test = obs_test.get["occ"]
    occ_novel = obs_novel.get["occ"]
    return spark.createDataFrame(
        [(
            n_train, n_test, n_novel,
            (n_novel / n_test) if n_test else 0.0,
            occ_test, occ_novel,
            (occ_novel / occ_test) if occ_test else 0.0,
        )],
        "n_train_types bigint, n_test_types bigint, novel_types bigint,"
        " type_novelty double, test_occurrences bigint,"
        " novel_occurrences bigint, occurrence_novelty double",
    )
