"""Repetition-based document quality signals for training-data filtering.

Excessively repetitive documents (boilerplate, templated spam, scraper
loops) are a standard removal target in large-scale LLM corpus builds;
the signals here follow the published Gopher rules (Rae et al.,
"Scaling Language Models: Methods, Analysis & Insights from Training
Gopher", 2021, §A1.1): duplicate n-gram fractions and the
top-n-gram character fraction.

Everything is computed ROW-LOCALLY — n-grams are built per document
inside the document's own row with ``transform(sequence(...))`` (the
same idiom as dedup/minhash.py shingling), so the whole signal bundle
is one shuffle-free projection over the corpus scan.  At 100 TB this
runs at scan speed; the alternative (explode + groupBy(doc, ngram))
would shuffle every token twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import normalize_text


def _ngram_expr(tok_col: str, size_col: str, n: int) -> Column:
    """All n-grams (with repeats) of a token-array column, ``|``-joined.

    Guarded: ``sequence(0, sz-n)`` DESCENDS for sz < n (Spark sequence
    semantics), so short docs get an explicit empty array instead.
    """
    if n == 1:
        return F.col(tok_col)
    gram = F.expr(
        f"transform(sequence(0, {size_col} - {n}), "
        f"i -> array_join(slice({tok_col}, i + 1, {n}), '|'))"
    )
    return F.when(F.col(size_col) >= n, gram).otherwise(
        F.expr("array()").cast("array<string>")
    )


def _dup_fraction(ng: Column) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    occurrence: 1 - distinct/total (0.0 for docs too short to have any)."""
    total = F.size(ng)
    return F.when(
        total > 0,
        (total - F.size(F.array_distinct(ng))) / total.cast("double"),
    ).otherwise(F.lit(0.0))


def _top_char_fraction(ng_col: str, norm_col: str) -> Column:
    """Characters covered by occurrences of the MOST FREQUENT n-gram,
    as a fraction of the normalized text length: count * length(gram) /
    length(text).  Overlapping occurrences each count their full gram
    length, so pathologically self-overlapping texts can exceed 1.0 —
    the signal is a filter threshold, not a probability.

    Computed in one pass over the SORTED n-gram array with a run-length
    ``aggregate`` (equal grams are adjacent after ``array_sort``), so
    the mode never needs a per-doc groupBy."""
    return F.expr(
        f"""
        CASE WHEN size({ng_col}) = 0 OR length({norm_col}) = 0 THEN 0.0D
        ELSE aggregate(
            array_sort({ng_col}),
            named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0L),
            (acc, x) -> named_struct(
                'prev', x,
                'run', IF(acc.prev <=> x, acc.run + 1, 1),
                'best', greatest(
                    acc.best,
                    CAST(IF(acc.prev <=> x, acc.run + 1, 1) * length(x)
                         AS BIGINT))),
            acc -> acc.best) / CAST(length({norm_col}) AS DOUBLE)
        END
        """
    )


def repetition_signals(
    df: DataFrame,
    text_col: str,
    *,
    out_prefix: str = "",
) -> DataFrame:
    """Append the Gopher-style repetition signal bundle:

    - ``dup_word_frac``  — duplicate unigram fraction
    - ``dup_2gram_frac`` — duplicate 2-gram fraction
    - ``dup_3gram_frac`` — duplicate 3-gram fraction
    - ``top_2gram_char_frac`` — char fraction of the most frequent 2-gram

    One shuffle-free projection; all arrays stay inside each doc's row.
    """
    p = out_prefix
    norm = normalize_text(text_col)
    base = df.withColumn("__norm", norm).withColumn(
        "__t", F.split(F.col("__norm"), " ")
    )
    base = base.withColumn("__sz", F.size(F.col("__t")))
    base = (
        base.withColumn("__ng2", _ngram_expr("__t", "__sz", 2))
        .withColumn("__ng3", _ngram_expr("__t", "__sz", 3))
    )
    out = (
        base.withColumn(f"{p}dup_word_frac", _dup_fraction(F.col("__t")))
        .withColumn(f"{p}dup_2gram_frac", _dup_fraction(F.col("__ng2")))
        .withColumn(f"{p}dup_3gram_frac", _dup_fraction(F.col("__ng3")))
        .withColumn(
            f"{p}top_2gram_char_frac", _top_char_fraction("__ng2", "__norm")
        )
    )
    return out.drop("__norm", "__t", "__sz", "__ng2", "__ng3")
