"""Deterministic data-mixture sampling for training-corpus assembly.

LLM pretraining mixes heterogeneous sources at target proportions that
differ from their natural sizes (public method: GPT-3 Table 2.2 weighted
sampling with >1 epochs for small high-quality sources, Brown et al.
2020; The Pile / LLaMA mixture tables are the same construction).  Given
a per-domain *rate*:

- ``rate <= 1`` subsamples the domain: a row survives iff its
  deterministic uniform ``u(id) < rate``;
- ``rate > 1`` repeats the domain across epochs: each row yields
  ``floor(rate)`` copies plus one more iff ``u(id) < frac(rate)``, with
  an ``epoch`` column (0-based) distinguishing replicas so downstream
  shuffling/sharding can interleave them.

``u`` is an engine-portable md5 hash of (seed, id) scaled to [0, 1) —
no RNG state, so the sample is reproducible on any engine, any
partitioning, any row order, and a DuckDB oracle replays it exactly.
In expectation each domain contributes ``rate x`` its row count, and the
realized count concentrates tightly (Chernoff) at corpus scale.

Plan shape: the rate table is a handful of rows — broadcast join on the
domain key; replication is a row-local ``explode(sequence(...))``.  The
corpus is scanned once and never shuffled.  At 100 TB the epoch fan-out
multiplies output volume, not shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^31 buckets give u a granularity of ~5e-10 — far below any practical
# mixture-rate precision
_U_BUCKETS = 2**31


def uniform_hash(id_col: str | Column, *, seed: int = 42) -> Column:
    """Deterministic uniform double in [0, 1) from (seed, id) — portable
    across engines (md5 on both sides; see text.hashing.md5_hash64)."""
    from gofast_spark.text.hashing import md5_hash64

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = md5_hash64(F.concat(F.lit(f"{seed}|"), c.cast("string")))
    return F.pmod(h, F.lit(_U_BUCKETS)) / F.lit(float(_U_BUCKETS))


def uniform_hash_sql(id_expr: str, *, seed: int = 42) -> str:
    """The DuckDB expression computing the identical ``u``."""
    from gofast_spark.text.hashing import md5_hash64_sql

    key = f"'{seed}|' || CAST({id_expr} AS VARCHAR)"
    return (
        f"(({md5_hash64_sql(key)})"
        f" % {_U_BUCKETS}) / {float(_U_BUCKETS)}"
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float] | DataFrame,
    id_col: str,
    *,
    seed: int = 42,
    default_rate: float = 1.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Sample/replicate each domain at its rate (see module doc).

    ``rates`` maps domain value -> rate (dict, or a DataFrame with
    columns (``domain_col``, ``rate``)); unlisted domains get
    ``default_rate``.  Output: input columns + ``epoch_col`` (0-based
    replica index; always 0 when every rate <= 1).  Rows are decided
    independently, so the operator composes with any upstream filter and
    is idempotent for a fixed seed.
    """
    spark = df.sparkSession
    if isinstance(rates, dict):
        for d, r in rates.items():
            if r < 0:
                raise ValueError(f"negative rate {r} for domain {d!r}")
        rates_df = spark.createDataFrame(
            [(k, float(v)) for k, v in rates.items()],
            f"{domain_col} string, rate double",
        )
    else:
        rates_df = rates.select(domain_col, F.col("rate").cast("double"))
    joined = df.join(F.broadcast(rates_df), domain_col, "left").withColumn(
        "__rate", F.coalesce(F.col("rate"), F.lit(float(default_rate)))
    )
    u = uniform_hash(id_col, seed=seed)
    n_copies = (
        F.floor("__rate")
        + F.when(u < F.col("__rate") - F.floor("__rate"), 1).otherwise(0)
    ).cast("int")
    out = (
        joined.withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
    )
    return out.select(*df.columns, F.col(epoch_col).cast("int").alias(epoch_col))


def mixture_rates(
    df: DataFrame,
    domain_col: str,
    weight_col: str | Column,
    targets: dict[str, float],
    *,
    budget: float,
) -> DataFrame:
    """Per-domain rates hitting a target mixture: domain d should
    contribute ``targets[d] / sum(targets) x budget`` weight (rows or
    tokens — whatever ``weight_col`` measures), so its rate is
    ``target_weight / available_weight`` — above 1 means the domain
    repeats over epochs (the small-high-quality-source case).

    Output: (``domain_col``, available, target_weight, rate) — feed the
    frame straight into :func:`mixture_sample`.
    """
    total = float(sum(targets.values()))
    if total <= 0:
        raise ValueError("targets must sum to a positive weight")
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    avail = df.groupBy(domain_col).agg(F.sum(wcol).alias("available"))
    tgt = df.sparkSession.createDataFrame(
        [(k, float(v) / total * budget) for k, v in targets.items()],
        f"{domain_col} string, target_weight double",
    )
    return (
        avail.join(F.broadcast(tgt), domain_col)
        .withColumn("rate", F.col("target_weight") / F.col("available"))
        .select(domain_col, "available", "target_weight", "rate")
    )


def temperature_mixture_rates(
    df: DataFrame,
    domain_col: str,
    weight_col: str | Column,
    *,
    temperature: float,
    budget: float,
) -> DataFrame:
    """Per-domain rates for TEMPERATURE-scaled multinomial sampling —
    the standard multilingual/multi-source rebalancing recipe
    (exponent-smoothed sampling, Conneau & Lample 2019): domain d's
    target share is ``available_d^T / sum_s available_s^T``, so T=1
    keeps natural proportions, T->0 approaches uniform over domains,
    and small sources are up-weighted in between.

    Fully distributed: per-domain availability is one aggregate, the
    normalizer is a 1-row broadcast — no dict collect, so the domain
    set may be unbounded.  Output (domain, available, target_weight,
    rate) — feed straight into :func:`mixture_sample`; rates above 1
    mean the domain repeats over epochs."""
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    avail = df.groupBy(domain_col).agg(F.sum(wcol).alias("available"))
    powed = avail.withColumn(
        "__p", F.pow(F.col("available"), F.lit(float(temperature)))
    )
    norm = powed.agg(F.sum("__p").alias("__z"))
    return (
        powed.crossJoin(F.broadcast(norm))
        .withColumn(
            "target_weight", F.col("__p") / F.col("__z") * F.lit(float(budget))
        )
        .withColumn("rate", F.col("target_weight") / F.col("available"))
        .select(domain_col, "available", "target_weight", "rate")
    )
