"""Text-column operators (SURVEY §2.9 text-columns family).

Reference: ``encode_text``/``decode_text`` (gofast/utils/text.py:1560,
1651), ``tokenize_text_columns`` (:2179), ``vectorize_text_columns``
(:2345), ``summarize_text_columns``
(gofast/dataops/transformation.py:31) / ``simple_extractive_summary``
(gofast/dataops/enrichment.py:228).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gofast_spark.text.analysis import tokenize_text


def encode_text(col: Column | str) -> Column:
    """UTF-8 -> base64 (encode_text, gofast/utils/text.py:1560).

    Spark's ``base64`` emits MIME 76-char line chunking; the ``\\r\\n``
    breaks are stripped so output matches the unchunked RFC 4648 form
    (python base64 / DuckDB).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.base64(c.cast("binary")), "[\\r\\n]", "")


def decode_text(col: Column | str) -> Column:
    """base64 -> UTF-8 (decode_text, gofast/utils/text.py:1651)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unbase64(c).cast("string")


def tokenize_text_columns(
    df: DataFrame, columns: Sequence[str], *, suffix: str = "_tokens"
) -> DataFrame:
    """Append ``{col}_tokens`` arrays for each text column
    (tokenize_text_columns, gofast/utils/text.py:2179)."""
    out = df
    for c in columns:
        out = out.withColumn(f"{c}{suffix}", tokenize_text(c))
    return out


def vectorize_text_columns(
    df: DataFrame,
    column: str,
    *,
    vocab_size: int = 1 << 16,
    min_df: int = 1,
    idf: bool = True,
    out_col: str = "tfidf",
):
    """Bag-of-words / TF-IDF vectors via MLlib (vectorize_text_columns,
    gofast/utils/text.py:2345).  Returns (models, transformed frame);
    CountVectorizer fits the vocabulary distributed, IDF fits document
    frequencies — both Estimator passes, transform stays lazy."""
    from pyspark.ml.feature import IDF, CountVectorizer

    toks = tokenize_text_columns(df, [column])
    cv = CountVectorizer(
        inputCol=f"{column}_tokens", outputCol="__tf",
        vocabSize=vocab_size, minDF=float(min_df),
    ).fit(toks)
    out = cv.transform(toks)
    if not idf:
        return (cv,), out.withColumnRenamed("__tf", out_col)
    idf_model = IDF(inputCol="__tf", outputCol=out_col).fit(out)
    return (cv, idf_model), idf_model.transform(out).drop("__tf")


def summarize_text_columns(
    df: DataFrame,
    columns: Sequence[str],
    *,
    suffix: str = "_summary",
    max_tokens: int = 12,
) -> DataFrame:
    """Cheap extractive summary per text column: the first ``max_tokens``
    tokens re-joined (the head of a document is its strongest extractive
    summary under the lead-bias heuristic).

    Reference intent: ``summarize_text_columns``
    (gofast/dataops/transformation.py:31) runs a neural summarizer; that
    is out of engine scope, so this is the documented deterministic
    approximation (swap in an LLM UDF where available).
    """
    out = df
    for c in columns:
        toks = tokenize_text(c)
        out = out.withColumn(
            f"{c}{suffix}",
            F.concat_ws(" ", F.slice(toks, 1, max_tokens)),
        )
    return out


def normalize_url(col: Column | str) -> Column:
    """Canonical URL key for source-level dedup (the C4/CCNet corpus
    pipelines dedup documents by normalized URL before any content
    hashing): lowercase, scheme stripped, ``www.`` stripped, fragment
    dropped, tracking parameters (``utm_*``/``fbclid``/``gclid``)
    removed, empty query and trailing slash trimmed.

    Pure codegen regex chain (RE2-portable patterns, same contract as
    text/pii.py) — zero shuffle; dedup is then one groupBy/dropDuplicates
    on the key."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.lower(F.trim(c))
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")                  # fragment
    # tracking params, wherever they sit: strip &-prefixed occurrences,
    # then a leading ?param followed by more params, then a lone ?param
    trk = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*"
    u = F.regexp_replace(u, f"&{trk}", "")
    u = F.regexp_replace(u, rf"\?{trk}&", "?")
    u = F.regexp_replace(u, rf"\?{trk}$", "")
    u = F.regexp_replace(u, r"[?&]+$", "")                # empty query tail
    u = F.regexp_replace(u, r"/$", "")                    # trailing slash
    return u
