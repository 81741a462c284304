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

    r15: grams are built with ``concat`` over direct element references
    instead of ``array_join(slice(...))`` — the HOF lambda runs
    interpreted either way, but concat-of-elements skips the per-gram
    array allocation + join walk (measured ~40% cheaper at sf0.1;
    byte-identical output — split() tokens are never NULL, so concat
    and array_join agree).
    """
    if n == 1:
        return F.col(tok_col)
    els = ", '|', ".join(f"{tok_col}[i + {j}]" for j in range(n))
    gram = F.expr(f"transform(sequence(0, {size_col} - {n}), i -> concat({els}))")
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


def _top_char_fraction(ng: Column, norm: Column) -> Column:
    """Characters covered by occurrences of the MOST FREQUENT n-gram,
    as a fraction of the normalized text length: count * length(gram) /
    length(text).  Overlapping occurrences each count their full gram
    length, so pathologically self-overlapping texts can exceed 1.0 —
    the signal is a filter threshold, not a probability.

    Computed in one pass over the SORTED n-gram array with a run-length
    ``aggregate`` (equal grams are adjacent after ``array_sort``), so
    the mode never needs a per-doc groupBy.  Takes Columns (not names)
    so it can run on let-bound lambda variables inside
    :func:`bound_signals`."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def _merge(acc: Column, x: Column) -> Column:
        run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(
                acc["best"], (run * F.length(x)).cast("bigint")
            ).alias("best"),
        )

    agg = F.aggregate(F.array_sort(ng), init, _merge, lambda acc: acc["best"])
    return F.when(
        (F.size(ng) == 0) | (F.length(norm) == 0), F.lit(0.0)
    ).otherwise(agg / F.length(norm).cast("double"))


def _let1(bound: Column, fn) -> Column:
    """Single-evaluation let-binding: wrap ``bound`` in a one-element
    array and apply ``fn`` through ``transform`` — the bound value is
    computed ONCE per row and every reference inside ``fn`` is a cheap
    lambda-variable field access.

    Why it exists (guide §1.2 per-task work): ``CollapseProject``
    inlines a ``withColumn`` alias into EVERY downstream reference, so
    an expensive expression (an n-gram array build) referenced by
    several signals is otherwise re-evaluated per reference unless
    runtime subexpression elimination happens to catch it; HOF lambdas
    additionally run interpreted, making each re-evaluation expensive.
    The transform boundary is opaque to the optimizer, so the binding
    survives plan rewrites (measured at sf0.1: the corpus_filter
    battery dropped ~35-40% with identical output)."""
    return F.transform(F.array(bound), fn)[0]


def bound_signals(
    df: DataFrame,
    text_col: str,
    *,
    out_prefix: str = "",
    extra: dict | None = None,
) -> DataFrame:
    """Append the Gopher repetition signals (and optional ``extra``
    per-row signals) computed from ONE let-bound struct per row: the
    normalized text, token array, and both gram arrays are each built
    exactly once.  ``extra`` maps output column suffix -> fn(s) where
    ``s`` is the bound struct lambda variable with fields ``nm`` (the
    normalized text), ``t`` (tokens), ``g2``/``g3`` (gram arrays)."""
    p = out_prefix
    base = (
        df.withColumn("__norm", normalize_text(text_col))
        .withColumn("__t", F.split(F.col("__norm"), " "))
        .withColumn("__sz", F.size(F.col("__t")))
    )
    bound = F.struct(
        F.col("__norm").alias("nm"),
        F.col("__t").alias("t"),
        _ngram_expr("__t", "__sz", 2).alias("g2"),
        _ngram_expr("__t", "__sz", 3).alias("g3"),
    )
    names = [
        "dup_word_frac", "dup_2gram_frac", "dup_3gram_frac",
        "top_2gram_char_frac",
    ] + list(extra or ())

    def _fields(s: Column) -> Column:
        cols = [
            _dup_fraction(s["t"]).alias("dup_word_frac"),
            _dup_fraction(s["g2"]).alias("dup_2gram_frac"),
            _dup_fraction(s["g3"]).alias("dup_3gram_frac"),
            _top_char_fraction(s["g2"], s["nm"]).alias(
                "top_2gram_char_frac"
            ),
        ]
        for name, fn in (extra or {}).items():
            cols.append(fn(s).alias(name))
        return F.struct(*cols)

    out = base.withColumn("__sig", _let1(bound, _fields))
    for name in names:
        out = out.withColumn(f"{p}{name}", F.col("__sig")[name])
    return out.drop("__norm", "__t", "__sz", "__sig")


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

    One shuffle-free projection; all arrays stay inside each doc's row
    (built once per row — see :func:`bound_signals`).
    """
    return bound_signals(df, text_col, out_prefix=out_prefix)
