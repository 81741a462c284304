"""k-nearest-neighbor classification over embedding vectors — the
brute-force exact baseline of the similarity-search family (the IVF /
PQ / JL modules in gofast_spark.sim are the approximate scale paths;
reference: gofast's sklearn-estimator surface, e.g. KNeighbors usage
in gofast/models — eager in-memory fit/predict).

Spark shape: the QUERY set is broadcast (small by contract, the
"given Q probes, scan the corpus once" shape shared with
sim/cosine.cosine_topk), the corpus is scanned once, and the
per-query top-k rank + majority vote are window/groupBy stages over
the k*|Q|-sized candidate frame.

Determinism: coordinates are quantized to micro-unit INTEGERS first,
so squared Euclidean distances, neighbor ranks (ties broken by train
id), and votes (ties broken by smaller label) are exact integer
arithmetic end-to-end — no float comparisons anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def knn_classify(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    *,
    dims: int = 8,
    k: int = 5,
    holdout_mod: int = 10,
    unit: int = 1_000_000,
) -> DataFrame:
    """Classify every held-out vector (``id %% holdout_mod == 0``) by
    the majority label of its ``k`` nearest training vectors under
    squared Euclidean distance on the first ``dims`` micro-unit
    -quantized coordinates (Fix & Hodges 1951; Cover & Hart 1967).

    Returns one row per query ``(id, label, pred, votes)`` ordered by
    id — ``label`` the held-out true label for downstream accuracy,
    ``votes`` the winning neighbor count."""
    cols = [
        F.floor(
            F.element_at(F.col(vec_col), i + 1).cast("double")
            * F.lit(float(unit))
            + F.lit(0.5)
        ).cast("bigint").alias(f"e{i}")
        for i in range(dims)
    ]
    base = df.where(
        F.col(id_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        *cols,
    )
    queries = base.where(F.col("id") % holdout_mod == 0).select(
        F.col("id").alias("qid"),
        F.col("label").alias("qlabel"),
        *[F.col(f"e{i}").alias(f"q{i}") for i in range(dims)],
    )
    train = base.where(F.col("id") % holdout_mod != 0)
    pairs = train.join(F.broadcast(queries), how="cross")
    dist = None
    for i in range(dims):
        term = (F.col(f"q{i}") - F.col(f"e{i}")) * (
            F.col(f"q{i}") - F.col(f"e{i}")
        )
        dist = term if dist is None else dist + term
    wr = Window.partitionBy("qid").orderBy(
        F.col("dist").asc(), F.col("id").asc()
    )
    nn = (
        pairs.withColumn("dist", dist)
        .withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= k)
    )
    votes = nn.groupBy("qid", "qlabel", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            F.col("qid").alias("id"),
            F.col("qlabel").alias("label"),
            F.col("label").alias("pred"),
            F.col("c").cast("bigint").alias("votes"),
        )
        .orderBy("id")
    )


def retrieval_eval(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    *,
    dims: int = 8,
    k: int = 10,
    p_at: int = 5,
    holdout_mod: int = 10,
    unit: int = 1_000_000,
    qunit: int = 1_000_000_000,
) -> DataFrame:
    """Retrieval-quality metrics for the brute-force nearest-neighbor
    index: precision@p, MRR, and nDCG@k (Jarvelin & Kekalainen, TOIS
    2002 for DCG) with binary relevance = "neighbor shares the
    query's label" — the evaluation harness a training-data retrieval
    pipeline runs over its ANN index, here against the exact index so
    the metrics are ground truth.

    Same broadcast-probe shape as :func:`knn_classify`.  Determinism:
    distances/ranks are exact integers; every per-rank DCG term,
    per-query reciprocal rank, and per-query nDCG ratio is quantized
    to ``1/qunit`` before the integer means; the ideal DCG comes from
    a rank-table cumulative join on ``least(n_relevant, k)``.
    Returns ONE row ``(n_queries, sum_p_at, precision_at_p, mrr,
    ndcg)``."""
    cols = [
        F.floor(
            F.element_at(F.col(vec_col), i + 1).cast("double")
            * F.lit(float(unit))
            + F.lit(0.5)
        ).cast("bigint").alias(f"e{i}")
        for i in range(dims)
    ]
    base = df.where(
        F.col(id_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        *cols,
    )
    queries = base.where(F.col("id") % holdout_mod == 0).select(
        F.col("id").alias("qid"),
        F.col("label").alias("qlabel"),
        *[F.col(f"e{i}").alias(f"q{i}") for i in range(dims)],
    )
    train = base.where(F.col("id") % holdout_mod != 0)
    pairs = train.join(F.broadcast(queries), how="cross")
    dist = None
    for i in range(dims):
        term = (F.col(f"q{i}") - F.col(f"e{i}")) * (
            F.col(f"q{i}") - F.col(f"e{i}")
        )
        dist = term if dist is None else dist + term
    wr = Window.partitionBy("qid").orderBy(
        F.col("dist").asc(), F.col("id").asc()
    )
    qu = float(qunit)
    nn = (
        pairs.withColumn("dist", dist)
        .withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= k)
        .select(
            "qid", "qlabel",
            (F.col("label") == F.col("qlabel")).cast("bigint")
            .alias("rel"),
            "rnk",
        )
    )
    dterm = F.floor(
        F.col("rel").cast("double")
        / F.log2((F.col("rnk") + F.lit(1)).cast("double"))
        * F.lit(qu)
        + F.lit(0.5)
    ).cast("bigint")
    per_q = nn.groupBy("qid", "qlabel").agg(
        F.sum(
            F.when(F.col("rnk") <= p_at, F.col("rel")).otherwise(
                F.lit(0)
            )
        ).alias("p_hits"),
        F.sum(dterm).alias("dcg_u"),
        F.min(
            F.when(F.col("rel") == 1, F.col("rnk"))
        ).alias("first_rel"),
    )
    n_rel = train.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    spark = df.sparkSession
    ranks = spark.range(1, k + 1).select(
        F.col("id").cast("int").alias("i"),
        F.floor(
            F.lit(1.0)
            / F.log2((F.col("id") + F.lit(1)).cast("double"))
            * F.lit(qu)
            + F.lit(0.5)
        ).cast("bigint").alias("iterm"),
    )
    w_i = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    idcg = ranks.select(
        "i", F.sum("iterm").over(w_i).alias("idcg_u")
    )
    scored = (
        per_q.join(
            F.broadcast(n_rel),
            per_q["qlabel"] == n_rel["label"],
        )
        .withColumn(
            "ideal_i",
            F.least(F.col("n_rel"), F.lit(k)).cast("int"),
        )
        .join(F.broadcast(idcg), F.col("ideal_i") == F.col("i"))
    )
    mrr_u = F.when(
        F.col("first_rel").isNotNull(),
        F.floor(
            F.lit(1.0) / F.col("first_rel").cast("double") * F.lit(qu)
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    ndcg_u = F.floor(
        F.col("dcg_u").cast("double") / F.col("idcg_u").cast("double")
        * F.lit(qu)
        + F.lit(0.5)
    ).cast("bigint")
    agg = scored.select(
        F.col("p_hits"), mrr_u.alias("mrr_u"), ndcg_u.alias("ndcg_u")
    ).agg(
        F.count(F.lit(1)).alias("q"),
        F.sum("p_hits").alias("sp"),
        F.sum("mrr_u").alias("sm"),
        F.sum("ndcg_u").alias("sn"),
    )
    qd = F.col("q").cast("double")
    return agg.select(
        F.col("q").cast("bigint").alias("n_queries"),
        F.col("sp").cast("bigint").alias("sum_p_at"),
        (
            F.col("sp").cast("double") / (F.lit(float(p_at)) * qd)
        ).alias("precision_at_p"),
        (F.col("sm").cast("double") / F.lit(qu) / qd).alias("mrr"),
        (F.col("sn").cast("double") / F.lit(qu) / qd).alias("ndcg"),
    )
