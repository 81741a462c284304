"""Universal reader/writer dispatch (SURVEY §2.1).

Reference parity:
- ``read_data`` / ``_read_data``: gofast/core/io.py:826, :652-825 —
  extension-dispatch reader with optional sanitize (column-name cleanup,
  numeric coercion, NaN-column drop).
- ``PandasDataHandlers.parsers/writers``: gofast/api/property.py:2781-2845 —
  the format matrix.
- ``export_data``: gofast/core/io.py:1137 — write one frame to many formats.

Spark-first design: formats Spark reads natively (parquet/csv/json/orc/
text/jdbc) go straight through ``spark.read`` so filter pushdown and column
pruning reach the scan; driver-only formats (excel/pickle/feather) fall back
to pandas-on-driver + ``createDataFrame`` and are documented as
small-data-only.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

# formats handled natively by Spark's distributed readers
_NATIVE_READERS = {
    ".parquet": "parquet",
    ".parq": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".orc": "orc",
    ".txt": "text",
}

# driver-side pandas fallbacks (small data only; mirrors the pandas parser
# matrix at gofast/api/property.py:2781-2793)
_PANDAS_READERS = {
    ".xlsx": "read_excel",
    ".xls": "read_excel",
    ".pkl": "read_pickle",
    ".feather": "read_feather",
    ".html": "read_html",
    ".xml": "read_xml",
}


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Normalize column names: lower-case, non-alphanumerics -> ``_``.

    Mirrors the ``sanitize`` path of ``_read_data``
    (gofast/core/io.py:726-780) and ``sanitize_frame_cols``
    (gofast/core/utils.py:1941).  A pure rename — zero-cost in the plan.
    """
    cleaned = [re.sub(r"\W+", "_", c.strip().lower()).strip("_") for c in df.columns]
    # disambiguate collisions deterministically
    seen: dict[str, int] = {}
    final = []
    for c in cleaned:
        if c in seen:
            seen[c] += 1
            final.append(f"{c}_{seen[c]}")
        else:
            seen[c] = 0
            final.append(c)
    return df.toDF(*final)


def read_data(
    spark: SparkSession,
    path: str,
    *,
    fmt: str | None = None,
    sanitize: bool = False,
    **options,
) -> DataFrame:
    """Extension-dispatch reader (gofast/core/io.py:826 ``read_data``).

    Native formats stay distributed; ``options`` pass through to the Spark
    reader (e.g. ``header=True, inferSchema=True`` for csv).
    """
    ext = os.path.splitext(path)[1].lower()
    fmt = fmt or _NATIVE_READERS.get(ext)
    if fmt:
        reader = spark.read.options(**{k: str(v) for k, v in options.items()})
        if fmt == "csv" and "header" not in options:
            reader = reader.option("header", "true").option("inferSchema", "true")
        if ext == ".tsv":
            reader = reader.option("sep", "\t")
        df = getattr(reader, fmt)(path)
    elif ext in _PANDAS_READERS:
        import pandas as pd

        pdf = getattr(pd, _PANDAS_READERS[ext])(path, **options)
        if isinstance(pdf, list):  # read_html returns a list
            pdf = pdf[0]
        df = spark.createDataFrame(pdf)
    else:
        raise ValueError(f"unsupported extension {ext!r} for {path!r}")
    return sanitize_columns(df) if sanitize else df


def export_data(df: DataFrame, base_path: str, formats: list[str], **options) -> list[str]:
    """Write one frame to several formats (gofast/core/io.py:1137).

    Distributed writers only; each format lands at ``{base_path}.{fmt}/``.
    """
    written = []
    mode = options.pop("mode", "overwrite")
    for fmt in formats:
        target = f"{base_path}.{fmt}"
        writer = df.write.mode(mode)
        if fmt == "csv":
            writer = writer.option("header", "true")
        if options:
            writer = writer.options(**{k: str(v) for k, v in options.items()})
        getattr(writer, fmt)(target)
        written.append(target)
    return written


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's star-schema parquet tables as a dict of frames."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for n in names:
        p = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(p):
            out[n] = spark.read.parquet(p)
    return out
