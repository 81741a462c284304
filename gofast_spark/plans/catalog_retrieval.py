"""Retrieval / LM-scoring / substring-dedup / chunking catalog entries.

Round-6 additions to the LLM-data-pipeline layer: BM25 keyword top-k,
per-doc tf-idf keywords, bigram-LM self-perplexity scoring, duplicated
verbatim-span detection (the substring-level dedup of Lee et al. 2022),
and sliding-window chunking.  Every oracle rebuilds the identical
pipeline relationally in DuckDB — token recipes, hash constants,
smoothing formulas, and rounding all mirror the Spark side exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import query
from gofast_spark.plans.catalog_llm import _docs, _norm_sql
from gofast_spark.text.hashing import char_hash_sql, md5_hash64_sql

# shared DuckDB token CTE (identical normalize recipe)
_TOKS = f"""
    norm AS (SELECT doc_id, {_norm_sql('text')} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS tk FROM norm)
"""

_BM25_TERMS = ("spark", "vector", "stream", "window")


@query(
    "bm25_topk_documents",
    oracle=f"""
    WITH {_TOKS},
    post AS (
      SELECT doc_id, u.term, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM toks) u
      WHERE u.term <> '' GROUP BY doc_id, u.term),
    stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl
      FROM (SELECT doc_id, any_value(dl) AS dl FROM post GROUP BY doc_id)),
    hits AS (SELECT * FROM post WHERE term IN {tuple(sorted(_BM25_TERMS))!r}),
    dfreq AS (SELECT term, count(*) AS df_t FROM hits GROUP BY term)
    SELECT doc_id,
           CAST(round(sum(
             ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ), 6) AS DOUBLE) AS score
    FROM hits JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a fixed keyword query (net-new retrieval
    surface per the builder brief; text/bm25.py)."""
    from gofast_spark.text.bm25 import bm25_topk

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return bm25_topk(d, list(_BM25_TERMS), k=20)


@query(
    "tfidf_keywords_documents",
    oracle=f"""
    WITH {_TOKS},
    post AS (
      SELECT doc_id, u.term, count(*) AS tf
      FROM (SELECT doc_id, unnest(tk) AS term FROM toks) u
      WHERE u.term <> '' GROUP BY doc_id, u.term),
    dfreq AS (SELECT term, count(*) AS df_t FROM post GROUP BY term),
    stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM post),
    scored AS (
      SELECT doc_id, term,
             CAST(round(tf * ln(n_docs / (1.0 + df_t)), 6) AS DOUBLE) AS tfidf
      FROM post JOIN dfreq USING (term) CROSS JOIN stats),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
    SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def tfidf_keywords_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed tf-idf."""
    from gofast_spark.text.bm25 import tfidf_topk_terms

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return tfidf_topk_terms(d, terms_per_doc=3)


@query(
    "bigram_lm_score_documents",
    oracle=f"""
    WITH {_TOKS},
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk) + 1),
               i -> CASE WHEN i = 1 THEN '<s>' ELSE tk[i - 1] END)) AS ctx,
             unnest(tk) AS nxt
      FROM toks WHERE len(tk) > 0),
    counts AS (SELECT ctx, nxt, count(*) AS c_bigram FROM bg GROUP BY ctx, nxt),
    ctx_tbl AS (SELECT ctx, sum(c_bigram) AS c_ctx FROM counts GROUP BY ctx),
    voc AS (SELECT count(DISTINCT nxt) AS vocab FROM counts)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(round(avg(-ln(
             (coalesce(c_bigram, 0) + 0.1)
             / (coalesce(c_ctx, 0) + 0.1 * vocab)
           )), 4) AS DOUBLE) AS avg_nll
    FROM bg
    LEFT JOIN counts USING (ctx, nxt)
    LEFT JOIN ctx_tbl USING (ctx)
    CROSS JOIN voc
    GROUP BY doc_id
    """,
)
def bigram_lm_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-perplexity quality scoring under a corpus-trained add-0.1
    bigram LM (CCNet-style filter signal; text/lm.py)."""
    from gofast_spark.text.lm import score_documents

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return score_documents(d, alpha=0.1)


@query(
    "duplicated_spans_documents",
    oracle=f"""
    WITH {_TOKS},
    pos AS (
      SELECT doc_id, u.i - 1 AS pos,
             {md5_hash64_sql("array_to_string(tk[u.i:u.i+7], '|')")} AS h
      FROM toks, LATERAL (SELECT unnest(range(1, len(tk) - 6)) AS i) u
      WHERE len(tk) >= 8),
    dup AS (SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos FROM pos SEMI JOIN dup USING (h)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER w IS NULL
                    OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS new_span
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    numbered AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM flagged)
    SELECT doc_id,
           CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + 8 AS INT) AS span_end_excl,
           CAST(max(pos) + 8 - min(pos) AS INT) AS n_tokens
    FROM numbered GROUP BY doc_id, span_id
    """,
)
def duplicated_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal verbatim passages (>= 8 tokens) shared by >= 2 docs
    (substring-level dedup, Lee et al. ACL 2022; dedup/spans.py)."""
    from gofast_spark.dedup.spans import duplicated_spans

    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = duplicated_spans(d, k=8)
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end_excl").cast("int").alias("span_end_excl"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


@query(
    "chunk_documents_windows",
    oracle=f"""
    WITH {_TOKS},
    sized AS (SELECT doc_id, tk, len(tk) AS n_tok FROM toks WHERE len(tk) > 0)
    SELECT doc_id,
           CAST(s.st // 24 AS INT) AS chunk_idx,
           CAST(s.st AS INT) AS tok_start,
           array_to_string(tk[s.st + 1:s.st + 32], ' ') AS chunk_text,
           CAST(len(tk[s.st + 1:s.st + 32]) AS INT) AS n_tokens
    FROM sized, LATERAL (SELECT unnest(range(0, n_tok, 24)) AS st) s
    """,
)
def chunk_documents_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-token sliding windows with 8-token overlap (stride 24) —
    shuffle-free RAG/context chunking (text/chunking.py)."""
    from gofast_spark.text.chunking import chunk_documents

    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = chunk_documents(d, chunk_tokens=32, overlap=8)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("tok_start").cast("int").alias("tok_start"),
        "chunk_text",
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


@query(
    "strip_spans_documents",
    oracle=f"""
    WITH {_TOKS},
    pos AS (
      SELECT doc_id, u.i - 1 AS pos,
             {md5_hash64_sql("array_to_string(tk[u.i:u.i+7], '|')")} AS h
      FROM toks, LATERAL (SELECT unnest(range(1, len(tk) - 6)) AS i) u
      WHERE len(tk) >= 8),
    dup AS (SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos FROM pos SEMI JOIN dup USING (h)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER w IS NULL
                    OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS new_span
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    numbered AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM flagged),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
      FROM numbered GROUP BY doc_id, span_id),
    toktbl AS (
      SELECT doc_id, u.i - 1 AS tpos, tk[u.i] AS tok
      FROM toks, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) u),
    kept AS (
      SELECT t.doc_id, t.tpos, t.tok
      FROM toktbl t ANTI JOIN spans sp
        ON sp.doc_id = t.doc_id AND t.tpos >= sp.s AND t.tpos < sp.e)
    SELECT doc_id,
           coalesce(string_agg(tok, ' ' ORDER BY tpos), '') AS clean_text,
           CAST(count(tok) AS INT) AS n_tokens_kept
    FROM (SELECT doc_id FROM toks) d
    LEFT JOIN kept USING (doc_id)
    GROUP BY doc_id
    """,
)
def strip_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end substring dedup remediation: documents rewritten with
    every cross-doc duplicated passage removed (dedup/spans.py
    strip_duplicated_spans; the Lee et al. 2022 cleanup applied, not
    just reported).  The oracle rebuilds the kept-token set with an
    anti-join against the span table and re-serializes with an ordered
    string_agg — a different physical strategy that must agree
    verbatim."""
    from gofast_spark.dedup.spans import strip_duplicated_spans

    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = strip_duplicated_spans(d, k=8)
    return out.select(
        "doc_id",
        "clean_text",
        F.col("n_tokens_kept").cast("int").alias("n_tokens_kept"),
    )


@query(
    "hashed_tf_documents",
    oracle=f"""
    WITH {_TOKS},
    tok AS (
      SELECT doc_id, unnest(tk) AS t FROM toks),
    cells AS (
      SELECT doc_id, CAST({char_hash_sql('t')} % 64 AS BIGINT) AS cell
      FROM tok WHERE t <> '')
    SELECT doc_id, cell, CAST(count(*) AS BIGINT) AS tf
    FROM cells GROUP BY doc_id, cell
    """,
)
def hashed_tf_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (Weinberger et al. 2009; text/features.py):
    stateless 64-cell hashed term-frequency vectors in sparse form —
    no vocabulary fit, identical on any corpus subset, every cell
    hash-verified (dense assembly + L2 path unit-tested against this
    sparse form and fed into cosine_topk in tests)."""
    from gofast_spark.text.features import hashed_tf_sparse

    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = hashed_tf_sparse(d, dim=64)
    return out.select(
        "doc_id",
        F.col("cell").cast("bigint").alias("cell"),
        F.col("tf").cast("bigint").alias("tf"),
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. NeurIPS 2023; text/dsir.py)
# ---------------------------------------------------------------------------

# shared weight pipeline: hashed 64-bucket token counts, add-1-smoothed
# target (lang='en') vs raw bucket distributions, per-doc importance
# weight as an EXACT integer micro-unit sum
_DSIR_W_CTES = """
    tok AS (
      SELECT doc_id, unnest(tk) AS t FROM toks),
    cells AS (
      SELECT doc_id, CAST({h} % 64 AS BIGINT) AS cell
      FROM tok WHERE t <> ''),
    rawtf AS (
      SELECT doc_id, cell, count(*) AS tf FROM cells GROUP BY doc_id, cell),
    tgtc AS (
      SELECT cell, count(*) AS c FROM cells JOIN documents USING (doc_id)
      WHERE lang = 'en' GROUP BY cell),
    rawc AS (
      SELECT cell, CAST(sum(tf) AS BIGINT) AS c FROM rawtf GROUP BY cell),
    tot AS (
      SELECT (SELECT sum(c) FROM rawc) AS rt, (SELECT sum(c) FROM tgtc) AS tt),
    llr AS (
      SELECT d.cell,
             CAST(round((ln((coalesce(t.c, 0) + 1.0) / (tt + 64.0))
                       - ln((coalesce(r.c, 0) + 1.0) / (rt + 64.0)))
                  * 1000000) AS BIGINT) AS lm
      FROM (SELECT unnest(range(0, 64)) AS cell) d
      LEFT JOIN tgtc t ON d.cell = t.cell
      LEFT JOIN rawc r ON d.cell = r.cell
      CROSS JOIN tot),
    w AS (
      SELECT doc_id, CAST(sum(tf * lm) AS BIGINT) AS logw_micro
      FROM rawtf JOIN llr ON rawtf.cell = llr.cell
      GROUP BY doc_id)
""".format(h=char_hash_sql('t'))


@query(
    "dsir_weights_documents",
    oracle=f"""
    WITH {_TOKS},
    {_DSIR_W_CTES}
    SELECT doc_id, logw_micro FROM w
    """,
)
def dsir_weights_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023; text/dsir.py):
    hashed-bucket distribution match of every doc against the lang='en'
    slice as the target corpus.  The per-bucket log-ratio is quantized
    to integer micro-units, so the per-doc weight is an exact integer
    aggregate — bit-identical across engines regardless of float
    summation order.  Bucket distributions are dim-sized broadcasts;
    the weight pass is one groupBy over sparse (doc, cell) rows."""
    from gofast_spark.text.dsir import dsir_logweights

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    raw = d.select("doc_id", "text")
    tgt_ids = d.filter(F.col("lang") == "en").select("doc_id")
    return dsir_logweights(
        raw, target_ids=tgt_ids, dim=64, alpha=1.0, llr_micro=True
    )


@query(
    "dsir_resample_documents",
    oracle=f"""
    WITH {_TOKS},
    {_DSIR_W_CTES},
    keyed AS (
      SELECT doc_id, logw_micro,
             logw_micro + CAST(round(
               (-ln(-ln({{u}} + 2.3283064365386963e-10))) * 1000000)
               AS BIGINT) AS key_micro
      FROM w)
    SELECT doc_id, logw_micro, key_micro FROM keyed
    ORDER BY key_micro DESC, doc_id LIMIT 25
    """.format(u="__U__"),
)
def dsir_resample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel top-k selection: 25 docs sampled without replacement
    with probability tilted toward the target distribution, noise from
    the engine-portable per-doc uniform hash (seed 7) so the selection
    is deterministic and fully oracle-checkable.  Plans as
    TakeOrderedAndProject over the weight aggregate."""
    from gofast_spark.text.dsir import dsir_resample

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    raw = d.select("doc_id", "text")
    tgt_ids = d.filter(F.col("lang") == "en").select("doc_id")
    return dsir_resample(
        raw, target_ids=tgt_ids, k=25, seed=7, dim=64, alpha=1.0,
        llr_micro=True
    )


# splice the portable uniform expression into the resample oracle (kept
# out of the f-string above: uniform_hash_sql itself contains braces)
from gofast_spark.operators.mixture import uniform_hash_sql as _uh_sql  # noqa: E402
from gofast_spark.plans.catalog import ORACLE_SQL as _OSQL  # noqa: E402

_OSQL["dsir_resample_documents"] = _OSQL["dsir_resample_documents"].replace(
    "__U__", "(" + _uh_sql("doc_id", seed=7) + ")"
)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random-sign projection (sim/projection.py)
# ---------------------------------------------------------------------------

from gofast_spark.sim.projection import jl_matrix_sql_values  # noqa: E402


@query(
    "jl_project_embeddings",
    oracle=f"""
    WITH m(j, i, s) AS (VALUES {jl_matrix_sql_values(64, 16, seed=3)}),
    cells AS (
      SELECT e.vec_id, m.j,
             sum(CAST(e.embedding[m.i + 1] AS DOUBLE) * m.s) AS dot
      FROM embeddings e CROSS JOIN m
      GROUP BY e.vec_id, m.j)
    SELECT vec_id, CAST(j AS INT) AS j,
           CAST(round(dot * 0.25, 6) AS DOUBLE) AS val
    FROM cells
    """,
)
def jl_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss 64->16 sign projection (Achlioptas 2003;
    sim/projection.py): the seeded sign matrix is a plan-time literal,
    so the pass is a pure row-local fold — no per-row hashing, no
    shuffle, no broadcast state — and the oracle recomputes every
    projected cell from the identical VALUES matrix."""
    from gofast_spark.plans.catalog import _t
    from gofast_spark.sim.projection import jl_project

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = jl_project(e, "embedding", in_dim=64, out_dim=16, seed=3)
    return out.select(
        "vec_id", F.posexplode("jl_vec").alias("j", "val")
    ).select(
        "vec_id",
        F.col("j").cast("int").alias("j"),
        F.round((F.col("val")), 6).cast("double").alias("val"),
    )


@query(
    "jl_shortlist_topk_embeddings",
    oracle=f"""
    WITH m(j, i, s) AS (VALUES {jl_matrix_sql_values(64, 16, seed=3)}),
    p AS (
      SELECT e.vec_id, m.j,
             sum(CAST(e.embedding[m.i + 1] AS DOUBLE)
                 / sqrt(list_sum(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                 * m.s) * 0.25 AS v
      FROM embeddings e CROSS JOIN m
      GROUP BY e.vec_id, m.j),
    d AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             sum((q.v - c.v) * (q.v - c.v)) AS d2
      FROM p q JOIN p c ON q.j = c.j
      WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    sh AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(d2, 6), vec_id) AS r1
      FROM d),
    cand AS (SELECT query_id, vec_id FROM sh WHERE r1 <= 20),
    scored AS (
      SELECT cand.query_id, cand.vec_id,
             list_sum(list_transform(range(1, 65),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(b.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cs
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.query_id
      JOIN embeddings b ON b.vec_id = cand.vec_id)
    SELECT query_id, vec_id,
           CAST(round(cs, 4) AS DOUBLE) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY round(cs, 6) DESC, vec_id) AS INTEGER) AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def jl_shortlist_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN through the JL projection: 16-dim L2 shortlist
    (4x fewer flops than the 64-dim brute pass), exact cosine re-rank
    of the 20 survivors — full-dim vectors ride the shortlist rows, so
    re-ranking needs no second corpus join.  The oracle replays both
    stages from the identical VALUES matrix."""
    from gofast_spark.plans.catalog import _t
    from gofast_spark.sim.projection import jl_shortlist_topk

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = e.where(F.col("vec_id") < 5)
    out = jl_shortlist_topk(
        e, q, "vec_id", "embedding",
        in_dim=64, out_dim=16, shortlist=20, k=5, seed=3,
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("cos_sim", 4).cast("double").alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )
