"""PII detection and redaction for training-data pipelines.

Training corpora are routinely scrubbed of personally identifiable
information before use; this module provides regex-based detection and
replacement for the machine-recognizable classes (emails, IPv4
addresses, SSN-shaped ids, dashed phone numbers).

Design constraints:

- Every pattern is engine-portable: no backreferences, no lookaround —
  the same pattern string runs under Java regex (Spark, codegen'd
  ``regexp_replace``) and RE2 (DuckDB oracle).  Character classes are
  written explicitly (``[0-9]`` not ``\\d``) to dodge dialect flags.
- Redaction is a chain of JVM-side ``regexp_replace`` calls — scan
  speed, no UDF, no shuffle.  Order matters and is fixed: emails first
  (their local parts contain digit runs that the weaker number patterns
  would otherwise shred), then SSN, IPv4, phone.

This is pattern-based scrubbing, not NER: names/addresses need a model
and are out of scope (the multimodal/stub policy applies — no ML
dependencies in this container).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied strictly in this order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b[0-9]{2,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
        "<PHONE>",
    ),
)


def redact_pii_col(col: Column | str) -> Column:
    """Column expression: text with every PII class replaced by its
    ``<CLASS>`` token, applying the fixed pattern order."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_pii(
    df: DataFrame, text_col: str, *, out_col: str | None = None
) -> DataFrame:
    """Redact PII in ``text_col`` (in place by default, or into
    ``out_col``).  Pure projection — scan-speed at any corpus size."""
    return df.withColumn(out_col or text_col, redact_pii_col(text_col))


def pii_profile(
    df: DataFrame, text_col: str, *, out_prefix: str = "n_"
) -> DataFrame:
    """Append one count column per PII class (``n_email``, ``n_ssn``,
    ``n_ipv4``, ``n_phone``).  Counts are STAGED — each class is counted
    on the text with all earlier classes already redacted, mirroring
    exactly what :func:`redact_pii` would remove (an email's digit runs
    are never double-counted as phone numbers)."""
    out = df
    cur = F.col(text_col)
    for name, pat, rep in PII_PATTERNS:
        out = out.withColumn(
            f"{out_prefix}{name}", F.regexp_count(cur, F.lit(pat))
        )
        cur = F.regexp_replace(cur, pat, rep)
    return out


def pii_oracle_sql(col: str) -> str:
    """DuckDB expression equivalent of :func:`redact_pii_col` — same
    patterns, same order, global replacement."""
    out = col
    for _, pat, rep in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{rep}', 'g')"
    return out
