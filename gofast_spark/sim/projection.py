"""Johnson-Lindenstrauss random-sign projection for embedding columns.

Achlioptas 2003 ("Database-friendly random projections"): a +-1 sign
matrix scaled by ``1/sqrt(out_dim)`` preserves pairwise distances in
expectation — the standard cheap dimensionality reduction in front of
ANN / clustering when 64-dim cosine math dominates (project to 16,
shortlist, re-rank exact).

Spark-first shape: the sign matrix is SMALL (out_dim x in_dim) and
deterministic, so it is generated DRIVER-SIDE from seeded md5 and
embedded in the plan as a nested array literal — the projection is
then a pure row-local ``zip_with``/``aggregate`` fold per output
coordinate: no per-row hashing, no shuffle, no UDF, and the identical
literal matrix goes into the DuckDB oracle, making every projected
cell reproducible bit-for-bit (modulo the usual 6-decimal rounding).

At 100 TB this is a map-only projection pass; the matrix is a plan
constant shipped with the task binary, never broadcast state.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jl_sign_matrix(
    in_dim: int, out_dim: int, *, seed: int = 0
) -> list[list[int]]:
    """out_dim x in_dim matrix of +-1, deterministic in ``seed`` —
    sign = parity of the first md5 byte of 'seed|j|i' (engine-free:
    plain Python, so any engine embedding the literals agrees)."""
    return [
        [
            1
            - 2
            * (hashlib.md5(f"{seed}|{j}|{i}".encode()).digest()[0] % 2)
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(
    df: DataFrame,
    vec_col: str,
    *,
    in_dim: int,
    out_dim: int,
    seed: int = 0,
    out_col: str = "jl_vec",
) -> DataFrame:
    """Input rows + ``out_col``: array<double> of length ``out_dim`` —
    ``(1/sqrt(out_dim)) * R v`` with the seeded sign matrix.  Pure
    projection (row-local fold per output coordinate)."""
    r = jl_sign_matrix(in_dim, out_dim, seed=seed)
    scale = 1.0 / math.sqrt(out_dim)
    rows = []
    for j in range(out_dim):
        row_lit = F.array(*[F.lit(float(s)) for s in r[j]])
        rows.append(
            (
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        row_lit,
                        lambda x, s: x.cast("double") * s,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * F.lit(scale)
            )
        )
    return df.withColumn(out_col, F.array(*rows))


def jl_matrix_sql_values(
    in_dim: int, out_dim: int, *, seed: int = 0
) -> str:
    """The same matrix as a SQL VALUES list ``(j, i, s)`` for oracle
    queries: ``(0, 0, 1), (0, 1, -1), ...``."""
    r = jl_sign_matrix(in_dim, out_dim, seed=seed)
    return ", ".join(
        f"({j}, {i}, {r[j][i]})"
        for j in range(out_dim)
        for i in range(in_dim)
    )


def jl_shortlist_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    in_dim: int,
    out_dim: int = 16,
    shortlist: int = 20,
    k: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Two-stage ANN: L2 shortlist in the JL-projected space, exact
    cosine re-rank in the full space — (query_id, vec_id, cos_sim,
    rank) for the top ``k`` per query.

    Stage 1 pairs every (query, candidate) like the brute baseline but
    does its distance math in ``out_dim`` dims (4x fewer flops at
    64->16); the full-dim vectors ride along in the same rows, so the
    ``shortlist`` survivors re-rank exactly WITHOUT a second corpus
    join.  Vectors are L2-NORMALIZED before projection so the
    shortlist's Euclidean metric agrees with the re-rank's cosine
    (``d^2 = 2 - 2 cos`` on the unit sphere — shortlisting raw L2
    against a cosine re-rank mixes metrics and craters recall).
    Determinism: both stages rank on 6-decimal-rounded scores with id
    tie-breaks (the repo's ANN convention)."""
    from pyspark.sql import Window

    from gofast_spark.sim.cosine import cosine_sim, l2_norm

    def _proj(df: DataFrame, out_id: str, v_alias: str, p_alias: str):
        nv = F.expr(
            f"transform(__n_{v_alias}, x -> CAST(x AS DOUBLE) / __l2_{v_alias})"
        )
        normed = df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(v_alias),
            F.col(vec_col).alias(f"__n_{v_alias}"),
            l2_norm(F.col(vec_col)).alias(f"__l2_{v_alias}"),
        ).withColumn("__unit", nv)
        # carry the already-computed vector norm so the exact re-rank
        # reuses it instead of re-folding per pair (r15 — see cosine_sim)
        return jl_project(
            normed, "__unit", in_dim=in_dim, out_dim=out_dim, seed=seed
        ).select(
            out_id,
            v_alias,
            F.col("jl_vec").alias(p_alias),
            F.col(f"__l2_{v_alias}").alias(f"{p_alias}_l2"),
        )

    pc = _proj(corpus, "vec_id", "__cv", "__cp")
    pq = _proj(queries, "query_id", "__qv", "__qp")
    d2 = F.aggregate(
        F.zip_with(
            F.col("__cp"), F.col("__qp"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.round(d2, 6).asc(), F.col("vec_id").asc()
    )
    short = (
        pc.crossJoin(F.broadcast(pq))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= shortlist)
    )
    cs = cosine_sim(
        F.col("__qv"),
        F.col("__cv"),
        norm_a=F.col("__qp_l2"),
        norm_b=F.col("__cp_l2"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.round(cs, 6).desc(), F.col("vec_id").asc()
    )
    return (
        short.withColumn("cos_sim", cs)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
