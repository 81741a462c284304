"""String case / clean / analysis scalar functions.

Reference: ``to_title_case`` (gofast/utils/text.py:316), ``to_camel_case``
(:426), ``to_snake_case`` (:552), ``capitalize_first`` (:651), ``slugify``
(:1192), ``truncate`` (:1368), ``levenshtein_distance`` (:1736),
``anonymize_text`` (:1929).  Each is a pure Column expression (native
string functions — ``initcap``/``regexp_replace``/``levenshtein`` run in
the JVM at scan speed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_title_case(col: Column | str) -> Column:
    """Title Case every word (gofast/utils/text.py:316)."""
    return F.initcap(_c(col))


def to_camel_case(col: Column | str, *, upper_first: bool = False) -> Column:
    """camelCase (or PascalCase with ``upper_first``) from any delimited
    string (gofast/utils/text.py:426): split on non-alphanumeric runs,
    first token lower, rest Capitalized, join without separator."""
    toks = F.split(F.lower(F.trim(_c(col))), "[^a-zA-Z0-9]+")
    head = F.element_at(toks, 1)
    if upper_first:
        head = F.initcap(head)
    tail = F.concat_ws(
        "", F.transform(F.slice(toks, 2, F.size(toks) - 1), lambda w: F.initcap(w))
    )
    return F.concat(head, tail)


def to_snake_case(col: Column | str) -> Column:
    """snake_case (gofast/utils/text.py:552): camel boundaries get an
    underscore, non-alphanumeric runs collapse to one ``_``, lower-cased."""
    out = F.regexp_replace(_c(col), r"([a-z0-9])([A-Z])", r"$1_$2")
    out = F.lower(out)
    out = F.regexp_replace(out, "[^a-z0-9]+", "_")
    return F.regexp_replace(out, "^_+|_+$", "")


def slugify(col: Column | str, *, delim: str = "-") -> Column:
    """URL slug (gofast/utils/text.py:1192): lower, non-alphanumeric runs
    -> ``delim``, trim leading/trailing delims.  The delimiter is
    regex-escaped in the trim pattern (a ``.`` delim would otherwise
    trim every character) and ``$``/``\\`` are escaped in the
    replacement (regexp_replace treats them as group references)."""
    import re

    repl = delim.replace("\\", "\\\\").replace("$", "\\$")
    out = F.regexp_replace(F.lower(_c(col)), "[^a-z0-9]+", repl)
    d = re.escape(delim)
    return F.regexp_replace(out, f"^(?:{d})+|(?:{d})+$", "")


def capitalize_first(col: Column | str) -> Column:
    """Upper-case only the first character (gofast/utils/text.py:651)."""
    c = _c(col)
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 2147483646))


def truncate_text(col: Column | str, n: int, *, ellipsis: str = "...") -> Column:
    """First ``n`` chars, appending ``ellipsis`` when truncated
    (gofast/utils/text.py:1368)."""
    c = _c(col)
    return F.when(
        F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit(ellipsis))
    ).otherwise(c)


def levenshtein_distance(a: Column | str, b: Column | str) -> Column:
    """Edit distance (gofast/utils/text.py:1736) — Spark built-in
    ``levenshtein`` (JVM DP implementation)."""
    return F.levenshtein(_c(a), _c(b))


def anonymize_text(
    col: Column | str,
    *,
    patterns: dict[str, str] | None = None,
) -> Column:
    """Mask PII-looking substrings (gofast/utils/text.py:1929).

    Default masks: email addresses -> ``[EMAIL]``, digit runs of 4+ ->
    ``[NUM]``.  ``patterns`` maps regex -> replacement for custom rules;
    applied in insertion order.
    """
    out = _c(col)
    rules = patterns or {
        r"[\w.+-]+@[\w-]+\.[\w.]+": "[EMAIL]",
        r"\d{4,}": "[NUM]",
    }
    for pat, repl in rules.items():
        out = F.regexp_replace(out, pat, repl)
    return out
