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
