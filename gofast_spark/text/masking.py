"""Deterministic masked-LM / span-corruption data preparation.

The last hop of an LLM-pretraining data pipeline: turn clean text into
(inputs, targets) training pairs.  Two standard recipes:

* :func:`mlm_token_mask` — BERT-style independent token masking
  (Devlin et al. 2018): each token masks with probability
  ``mask_rate``.  Entirely ROW-LOCAL (one projection, no shuffle): the
  per-token coin flip is the portable md5 uniform over
  ``(seed, id, position)``, so the corruption is reproducible across
  runs, engines, and corpus repartitions — the property that makes
  training-data builds auditable.

* :func:`span_corruption` — T5-style span corruption (Raffel et al.
  2020): adjacent masked tokens merge into one span, each span is
  replaced by a numbered sentinel in the inputs and expanded as
  ``sentinel tokens...`` in the targets.  Span numbering needs a
  per-doc running count, so this variant uses a posexplode + per-doc
  window (partitioned by doc id — parallel at any corpus size, the
  same shape as dedup/spans.py's island detection).

Reference parity: net-new surface (builder brief: training-data
pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text

_U_M = 2_147_483_648  # 2**31, matches operators/mixture + text/hashing


def _pos_uniform_sql(id_sql: str, pos_sql: str, seed: int) -> str:
    """Spark-SQL text for the portable per-(id, position) uniform."""
    key = f"concat('{seed}|', cast({id_sql} as string), '|', cast({pos_sql} as string))"
    # divide as DOUBLE explicitly: a bare `/ 2147483648.0` literal parses
    # as DECIMAL in Spark SQL (decimal division semantics), while DuckDB
    # computes a double — the engines would then disagree on boundary u's
    return (
        f"pmod(cast(conv(substring(md5({key}), 1, 15), 16, 10) as bigint), "
        f"{_U_M}L) / cast({_U_M} as double)"
    )


def mlm_token_mask(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    mask_rate: float = 0.15,
    seed: int = 42,
    mask_token: str = "[MASK]",
) -> DataFrame:
    """(id, masked_text, targets, n_tokens, n_masked): BERT-style
    independent token masking over normalized text.  ``targets`` is the
    space-joined ``pos:token`` list of masked positions (0-based).
    Pure projection — no shuffle, no UDF."""
    u = _pos_uniform_sql(id_col, "i - 1", seed)
    base = df.select(
        F.col(id_col),
        F.split(normalize_text(text_col), " ").alias("__tk"),
    )
    flags_sql = (
        f"transform(sequence(1, size(__tk)), i -> ({u}) < {float(mask_rate)})"
    )
    # r15 (guide §1.2): let-bind (tokens, flags) once per row — the old
    # layout let CollapseProject inline the md5-per-position flag
    # transform into all three consumers (masked_text, targets,
    # n_masked), tripling the hash work.  Same binding idiom as
    # text/repetition.bound_signals; identical outputs.
    sig = F.expr(
        f"""
        transform(array(named_struct('tk', __tk, 'fl', {flags_sql})),
          b -> named_struct(
            'masked_text', array_join(
              transform(sequence(1, size(b.tk)),
                i -> IF(element_at(b.fl, i), '{mask_token}',
                        element_at(b.tk, i))), ' '),
            'targets', array_join(
              filter(transform(sequence(1, size(b.tk)),
                i -> IF(element_at(b.fl, i),
                        concat(cast(i - 1 as string), ':',
                               element_at(b.tk, i)),
                        cast(null as string))), x -> x is not null), ' '),
            'n_masked', size(filter(b.fl, x -> x))
          ))[0]
        """
    )
    step = base.select(id_col, "__tk", sig.alias("__sig"))
    return step.select(
        id_col,
        F.col("__sig")["masked_text"].alias("masked_text"),
        F.col("__sig")["targets"].alias("targets"),
        F.size("__tk").alias("n_tokens"),
        F.col("__sig")["n_masked"].alias("n_masked"),
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    mask_rate: float = 0.15,
    seed: int = 42,
) -> DataFrame:
    """(id, inputs, targets, n_spans): T5-style span corruption.
    Tokens mask independently at ``mask_rate`` (same portable coin as
    :func:`mlm_token_mask`); ADJACENT masked tokens merge into one
    span.  ``inputs`` replaces each span with ``<extra_id_K>``
    (0-based, per doc, in position order); ``targets`` is the
    concatenation of ``<extra_id_K> masked tokens...`` per span.

    Plan: posexplode to (id, pos, tok), per-doc window for the span
    running count, two ordered collect_list aggregations — every stage
    partitions by doc id, so parallelism follows the corpus."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias(
            "pos", "tok"
        ),
    )
    u = _pos_uniform_sql(id_col, "pos", seed)
    flagged = toks.withColumn("__fl", F.expr(f"({u}) < {float(mask_rate)}"))
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = flagged.withColumn(
        "__new",
        F.col("__fl")
        & ~F.coalesce(F.lag("__fl").over(w), F.lit(False)),
    ).withColumn(
        "__span",
        F.sum(F.col("__new").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("__span").cast("string"), F.lit(">")
    )
    # inputs: unmasked tokens verbatim; the FIRST token of a span emits
    # the sentinel; span interiors drop
    in_rows = flagged.where(~F.col("__fl") | F.col("__new")).select(
        id_col,
        "pos",
        F.when(F.col("__new"), sentinel).otherwise(F.col("tok")).alias("__t"),
    )
    inputs = in_rows.groupBy(id_col).agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, __t))), "
                   "s -> s.__t)"),
            " ",
        ).alias("inputs")
    )
    # targets: masked tokens only, span leaders prefixed by the sentinel
    tgt_rows = flagged.where(F.col("__fl")).select(
        id_col,
        "pos",
        "__span",
        F.when(
            F.col("__new"), F.concat(sentinel, F.lit(" "), F.col("tok"))
        )
        .otherwise(F.col("tok"))
        .alias("__t"),
    )
    targets = tgt_rows.groupBy(id_col).agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, __t))), "
                   "s -> s.__t)"),
            " ",
        ).alias("targets"),
        (F.max("__span") + 1).cast("int").alias("n_spans"),
    )
    return (
        inputs.join(targets, id_col, "left")
        .select(
            id_col,
            "inputs",
            F.coalesce(F.col("targets"), F.lit("")).alias("targets"),
            F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        )
    )
