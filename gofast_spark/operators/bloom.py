"""Bloom-filter semi-join pruning (explicit runtime filter).

The single biggest shuffle lever in a 100-TB star join is dropping fact
rows that cannot match BEFORE the exchange.  Spark's AQE can inject
runtime bloom filters on its own (`spark.sql.optimizer.runtime.
bloomFilter.enabled`), but only under planner heuristics; this operator
is the explicit, deterministic version the user controls — the same
role `might_contain` plays in Databricks/Iceberg runtime filtering.

Portability-first design: bit positions come from k LCG-family integer
hashes (Knuth multiplicative constants), so DuckDB can rebuild the
EXACT bitmap relationally and the driver's differential oracle verifies
the filter bit-for-bit — false positives included (they are a
deterministic function of the key set, not noise).

Scale shape:

* build — one aggregate over the (small) build side: explode each key
  into its k bit positions, OR-fold per 64-bit word.  The result is
  ``n_bits/64`` longs; for the classic 1M-key/1% filter that is ~150 KB
  — collected to the driver (bounded by construction, like any runtime
  filter) and shipped to executors as a literal array, so probing is
  pure codegen: two multiplies, a shift, an AND per hash.  No join, no
  shuffle, no UDF on the probe side.
* probe — ``where(bloom_might_contain(...))`` prunes the fact scan
  before any exchange; the exact join afterwards removes the (rare,
  deterministic) false positives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative-hash constants (TAOCP vol. 3, 6.4) reduced mod
# 2^61-1; one (mult, add) pair per hash function.
_BLOOM_SEEDS: list[tuple[int, int]] = [
    (2654435761, 0x9E3779B1),
    (2246822519, 0x85EBCA77),
    (3266489917, 0xC2B2AE3D),
    (668265263, 0x27D4EB2F),
    (374761393, 0x165667B1),
]
_BLOOM_P = (1 << 61) - 1  # Mersenne prime keeps pmod portable in int64


def _bit_pos(key: Column, j: int, n_bits: int) -> Column:
    """Deterministic bit position of hash j for an int64 key column.

    Keys are assumed non-negative and < 2^31 (surrogate keys) so the
    multiply never overflows int64 in either engine (DuckDB errors on
    BIGINT overflow rather than wrapping)."""
    a, c = _BLOOM_SEEDS[j]
    h = F.pmod(key.cast("long") * F.lit(a) + F.lit(c), F.lit(_BLOOM_P))
    return F.pmod(h, F.lit(n_bits))


def bit_pos_sql(key_sql: str, j: int, n_bits: int) -> str:
    """The same bit position as DuckDB SQL text (oracle support)."""
    a, c = _BLOOM_SEEDS[j]
    return (
        f"((CAST({key_sql} AS BIGINT) * {a} + {c}) % {_BLOOM_P}"
        f" % {n_bits} + {n_bits}) % {n_bits}"
    )


def bloom_build(
    df: DataFrame, key_col: str, *, n_bits: int = 8192, k: int = 3
) -> list[int]:
    """Build the bitmap as a list of ``n_bits/64`` int64 words.

    One explode (k rows per key) + one groupBy over at most n_bits/64
    groups; the collect is bounded by ``n_bits`` regardless of build-side
    cardinality.
    """
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    if not 1 <= k <= len(_BLOOM_SEEDS):
        raise ValueError(f"k must be in 1..{len(_BLOOM_SEEDS)}")
    key = F.col(key_col)
    positions = df.select(
        F.explode(
            F.array(*[_bit_pos(key, j, n_bits) for j in range(k)])
        ).alias("bit")
    )
    words = (
        positions.select(
            (F.col("bit") / 64).cast("int").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["w"]] = r["word"]
    return out


# 2^i as int64 words; index 63 is the sign bit (same bit pattern as
# shiftleft(1L, 63), which Python's 1<<63 would overflow)
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def bloom_might_contain(
    key_col: str, bitmap: list[int], *, k: int = 3
) -> Column:
    """Codegen'd membership predicate: all k bits set in the bitmap.

    The bitmap is bound ONCE as a single array *Literal* node (and each
    bit position computed once), not spliced into SQL text per hash —
    splicing embedded the word list k times and the position expression
    twice per check, so the classic 1M-key/1% filter (~150k words)
    produced a tens-of-MB expression tree that blew Catalyst/codegen
    limits.  As one constant the same bitmap is ~1.2 MB shipped with
    the plan; still no join, no shuffle, no UDF."""
    n_bits = len(bitmap) * 64
    arr = F.lit(bitmap)
    pw = F.lit(_POW2)
    key = F.col(key_col)
    positions = F.array(*[_bit_pos(key, j, n_bits) for j in range(k)])

    def _bit_set(p: Column) -> Column:
        word = F.element_at(arr, (p / F.lit(64)).cast("int") + F.lit(1))
        mask = F.element_at(pw, F.pmod(p, F.lit(64)).cast("int") + F.lit(1))
        return word.bitwiseAND(mask) != F.lit(0)

    return F.forall(positions, _bit_set)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 8192,
    k: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Fact rows whose key appears in dim — bloom-pruned before any
    shuffle, then (by default) made exact with a broadcast-eligible
    left-semi join.  ``exact=False`` returns the raw bloom-passing rows
    (deterministic superset; what the differential oracle checks)."""
    dk = dim_key or fact_key
    bitmap = bloom_build(
        dim.select(F.col(dk).alias(fact_key)), fact_key, n_bits=n_bits, k=k
    )
    pruned = fact.where(bloom_might_contain(fact_key, bitmap, k=k))
    if not exact:
        return pruned
    return pruned.join(
        dim.select(F.col(dk).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
