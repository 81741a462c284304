"""Count-min sketch: mergeable frequency estimates and heavy hitters.

Complement to the HLL distinct sketches (sketches.py): HLL answers
"how many distinct", count-min answers "how often does THIS key occur"
from a fixed-size state (Cormode & Muthukrishnan, J. Algorithms 2005).
The sketch is a d x w counter grid; each key increments one counter per
row (chosen by d independent hashes) and a point estimate is the MIN of
its d counters — an overestimate by at most eps*N with probability
1-delta for w = e/eps, d = ln(1/delta).

Spark-first shape: the sketch IS a DataFrame of (row, col, cnt) cells —
built with one explode (d rows per input) + one groupBy over at most
d*w cells (map-side combine does almost all the work; the shuffle
carries <= d*w rows per partition).  Sketches MERGE by unioning cell
frames and re-summing — daily sketches roll up to weekly exactly like
the HLL path.  Estimation joins candidate keys against the (tiny,
broadcast) cell frame — no second scan of the raw data.

Hashes are the same LCG family as operators/bloom.py, so DuckDB
rebuilds the identical grid and the differential oracle verifies
estimates bit-for-bit (the overestimates are deterministic, not
noise).  Keys are hashed from their string form to cover any type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofast_spark.operators.bloom import _BLOOM_P, _BLOOM_SEEDS
from gofast_spark.text.hashing import char_hash, char_hash_sql


def _cell(key_hash: Column, j: int, width: int) -> Column:
    a, c = _BLOOM_SEEDS[j]
    return F.pmod(
        F.pmod(key_hash * F.lit(a) + F.lit(c), F.lit(_BLOOM_P)),
        F.lit(width),
    )


def cell_sql(key_hash_sql: str, j: int, width: int) -> str:
    """DuckDB text for the same cell index (key hash is non-negative)."""
    a, c = _BLOOM_SEEDS[j]
    return f"(({key_hash_sql}) * {a} + {c}) % {_BLOOM_P} % {width}"


def cms_build(
    df: DataFrame, key_col: str, *, width: int = 256, depth: int = 3
) -> DataFrame:
    """(row, col, cnt) cells of the count-min grid over ``key_col``
    (stringified, then portably hashed).  At most width*depth rows."""
    if not 1 <= depth <= len(_BLOOM_SEEDS):
        raise ValueError(f"depth must be in 1..{len(_BLOOM_SEEDS)}")
    h = char_hash(f"CAST({key_col} AS STRING)")
    cells = df.select(
        F.posexplode(
            F.array(*[_cell(h, j, width) for j in range(depth)])
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union cell frames built with the same (width, depth) into one
    sketch — counters add."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Point estimates for each row of ``keys``: min over the key's
    depth cells.  The sketch frame is broadcast (<= width*depth rows);
    the candidate frame is never shuffled."""
    h = char_hash(f"CAST({key_col} AS STRING)")
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[_cell(h, j, width) for j in range(depth)])
        ).alias("row", "col"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    min_share: float = 0.01,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Keys whose ESTIMATED frequency is >= min_share of all rows
    (guaranteed superset of the true heavy hitters — count-min never
    underestimates).  Candidates are the distinct keys; the sketch and
    the total are both broadcast."""
    sketch = cms_build(df, key_col, width=width, depth=depth)
    total = df.agg(F.count("*").alias("n_total"))
    est = cms_estimate(
        sketch, df.select(key_col).distinct(), key_col,
        width=width, depth=depth,
    )
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est") >= F.lit(min_share) * F.col("n_total"))
        .select(key_col, "est", "n_total")
    )
