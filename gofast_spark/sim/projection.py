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
