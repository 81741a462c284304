"""Catalog entries: Bloom-filter runtime pruning, PageRank centrality,
count-min frequency sketches.

Each oracle rebuilds the full algorithm relationally in DuckDB from the
same public hash constants (operators/bloom.py seeds, text/hashing LCG),
so the differential gate verifies bit positions, counter grids, and the
unrolled power iteration — not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.operators.bloom import bit_pos_sql
from gofast_spark.functions.cms import cell_sql
from gofast_spark.plans.catalog import _t, query
from gofast_spark.text.hashing import char_hash_sql

_N_BITS = 8192
_K = 3


def _bloom_bits_cte() -> str:
    """Union of the k bit positions over the dim key set."""
    parts = " UNION ".join(
        f"SELECT {bit_pos_sql('k', j, _N_BITS)} AS pos FROM dimk"
        for j in range(_K)
    )
    return f"bits AS ({parts})"


@query(
    "bloom_prefilter_orders",
    oracle=f"""
    WITH dimk AS (
      SELECT DISTINCT c_custkey AS k FROM customer
      WHERE c_mktsegment = 'BUILDING'),
    {_bloom_bits_cte()}
    SELECT o_orderkey, o_custkey FROM orders
    WHERE {" AND ".join(
        f"{bit_pos_sql('o_custkey', j, _N_BITS)} IN (SELECT pos FROM bits)"
        for j in range(_K)
    )}
    """,
)
def bloom_prefilter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bloom-pruned fact scan (the explicit runtime
    filter, exact=False so the oracle checks the filter itself —
    false positives are a deterministic function of the key set)."""
    from gofast_spark.operators.bloom import bloom_semi_join

    orders = _t(spark, sf_dir, "orders")
    dim = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    out = bloom_semi_join(
        orders,
        dim,
        fact_key="o_custkey",
        dim_key="c_custkey",
        n_bits=_N_BITS,
        k=_K,
        exact=False,
    )
    return out.select("o_orderkey", "o_custkey")


_PR_ITER = 5
_PR_D = 0.85
_SUPP_OFFSET = 1_000_000


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration synchronous PageRank chain (same pattern as
    the gradient_descent / IGLS unrolled oracles)."""
    ctes = [
        f"""pairs AS (
      SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS src,
             CAST(l.l_suppkey + {_SUPP_OFFSET} AS BIGINT) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    edges AS (
      SELECT src, dst FROM pairs
      UNION
      SELECT dst AS src, src AS dst FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)"""
    ]
    for t in range(1, _PR_ITER + 1):
        ctes.append(
            f"""i{t} AS (
      SELECT e.dst AS node, sum(r.rank / d.outdeg) AS inc
      FROM edges e
      JOIN r{t - 1} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst),
    r{t} AS (
      SELECT nd.node,
             (1 - {_PR_D}) / nn.n + {_PR_D} * coalesce(i.inc, 0) AS rank
      FROM nodes nd CROSS JOIN nn LEFT JOIN i{t} i ON i.node = nd.node)"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT node, CAST(round(rank, 8) AS DOUBLE) AS rank
    FROM r{_PR_ITER}
    """


@query("pagerank_customer_supplier", oracle=_pagerank_oracle())
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the undirected customer-supplier
    trading graph (orders x lineitem), 5 synchronous iterations —
    verified against a fully unrolled SQL power iteration."""
    from gofast_spark.ml.graph import edges_from_pairs, pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("cust"),
        (F.col("l_suppkey") + _SUPP_OFFSET).alias("supp"),
    )
    e = edges_from_pairs(pairs, "cust", "supp", undirected=True)
    # node frame is tiny relative to edges -> broadcast plan (see pagerank)
    r = pagerank(
        e, iterations=_PR_ITER, damping=_PR_D, broadcast_ranks=True
    )
    return r.select("node", F.round("rank", 8).cast("double").alias("rank"))


_CMS_W = 256
_CMS_D = 3


@query(
    "cms_heavy_hitters_events",
    oracle=f"""
    WITH keyed AS (
      SELECT event_type, {char_hash_sql('event_type')} AS h FROM events),
    cells AS (
      {" UNION ALL ".join(
        f"SELECT {j} AS rw, {cell_sql('h', j, _CMS_W)} AS cl FROM keyed"
        for j in range(_CMS_D)
      )}),
    grid AS (SELECT rw, cl, count(*) AS cnt FROM cells GROUP BY rw, cl),
    total AS (SELECT count(*) AS n_total FROM events),
    cand AS (
      SELECT DISTINCT event_type, {char_hash_sql('event_type')} AS h
      FROM events),
    probe AS (
      {" UNION ALL ".join(
        f"SELECT event_type, {j} AS rw, {cell_sql('h', j, _CMS_W)} AS cl FROM cand"
        for j in range(_CMS_D)
      )}),
    est AS (
      SELECT p.event_type, min(coalesce(g.cnt, 0)) AS est
      FROM probe p LEFT JOIN grid g USING (rw, cl)
      GROUP BY p.event_type)
    SELECT event_type, CAST(est AS BIGINT) AS est,
           CAST(n_total AS BIGINT) AS n_total
    FROM est CROSS JOIN total
    WHERE est >= 0.1 * n_total
    """,
)
def cms_heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter event types by count-min estimate (>= 10% of rows)
    — the grid, probes, and min-estimates all hash-verified."""
    from gofast_spark.functions.cms import cms_heavy_hitters

    ev = _t(spark, sf_dir, "events")
    out = cms_heavy_hitters(
        ev, "event_type", min_share=0.1, width=_CMS_W, depth=_CMS_D
    )
    return out.select(
        "event_type",
        F.col("est").cast("bigint").alias("est"),
        F.col("n_total").cast("bigint").alias("n_total"),
    )


@query(
    "merge_upsert_customer",
    oracle="""
    WITH src AS (
      SELECT o_custkey AS c_custkey,
             CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS c_acctbal
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_custkey),
    tgt AS (SELECT c_custkey, c_name, c_acctbal FROM customer)
    SELECT coalesce(t.c_custkey, s.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN 'UPDATED'
                ELSE t.c_name END AS c_name,
           CAST(CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE t.c_acctbal END AS DOUBLE) AS c_acctbal
    FROM tgt t FULL OUTER JOIN src s ON s.c_custkey = t.c_custkey
    """,
)
def merge_upsert_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO semantics (operators/merge_upsert.py): apply an
    urgent-order spend batch to the customer table — matched keys take
    the batch row wholesale (UPDATE replaces the row, the standard
    MERGE contract), unmatched batch keys insert.  The oracle is an
    independent FULL OUTER JOIN resolution that must agree
    row-for-row."""
    from gofast_spark.operators.merge_upsert import merge_upsert

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    src = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.round(F.sum("o_totalprice"), 2)
            .cast("double")
            .alias("c_acctbal")
        )
        .withColumn("c_name", F.lit("UPDATED"))
        .select("c_custkey", "c_name", "c_acctbal")
    )
    return merge_upsert(
        cust,
        src,
        "c_custkey",
        update_condition=None,
        check_unique_source=False,
    )
