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
    ".pickle": "read_pickle",
    ".feather": "read_feather",
    ".html": "read_html",
    ".xml": "read_xml",
    ".sas7bdat": "read_sas",   # pandas-native SAS reader
    ".sav": "read_spss",       # needs pyreadstat (gated at call time)
    ".fwf": "read_fwf",
    ".dta": "read_stata",
    ".stata": "read_stata",
    ".hdf": "read_hdf",        # needs pytables (gated at call time)
    ".h5": "read_hdf",
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


# pandas-only sinks (reference writer matrix, gofast/api/property.py:
# 2827-2845): written via a bounded toPandas on the driver — these are
# report/interchange formats, not warehouse formats, so the "small by
# the time you export it" contract applies.  Values are pandas writer
# method names; hdf/excel need optional libs (pytables/openpyxl) and
# raise ImportError with a clear message when absent.
_PANDAS_WRITERS = {
    "feather": "to_feather",
    "stata": "to_stata",
    "dta": "to_stata",
    "hdf": "to_hdf",
    "h5": "to_hdf",
    "excel": "to_excel",
    "xlsx": "to_excel",
    "tex": "to_latex",
    "pickle": "to_pickle",
}
_SPARK_WRITERS = {"csv", "json", "parquet", "orc", "text"}


def export_data(
    df: DataFrame,
    base_path: str,
    formats: list[str],
    *,
    max_rows: int | None = 1_000_000,
    **options,
) -> list[str]:
    """Write one frame to several formats (gofast/core/io.py:1137;
    writer matrix gofast/api/property.py:2827-2845).

    Spark-native formats (csv/json/parquet/orc/text) use distributed
    writers at ``{base_path}.{fmt}/``; pandas-only interchange formats
    (feather/stata/hdf/excel/tex/pickle) fall back to a driver-side
    pandas write at ``{base_path}.{fmt}``.  The pandas path is guarded:
    ``max_rows`` (default 1M) is enforced with a bounded ``limit(n+1)``
    count before ``toPandas`` so a mistakenly-huge frame raises instead
    of OOMing the driver (ADVICE r5); pass ``max_rows=None`` to opt out.
    """
    written = []
    mode = options.pop("mode", "overwrite")
    pandas_fmts = [f for f in formats if f in _PANDAS_WRITERS]
    pdf = None
    if pandas_fmts:
        if max_rows is not None:
            # bounded probe: scans at most max_rows+1 rows, never the frame
            if df.limit(max_rows + 1).count() > max_rows:
                raise ValueError(
                    f"export_data: frame exceeds max_rows={max_rows} for "
                    f"driver-side formats {pandas_fmts}; filter/aggregate "
                    "first or raise max_rows explicitly"
                )
        pdf = df.toPandas()
    for fmt in formats:
        target = f"{base_path}.{fmt}"
        if fmt in _PANDAS_WRITERS:
            method = _PANDAS_WRITERS[fmt]
            fn = getattr(pdf, method)
            if method == "to_hdf":
                fn(target, key=options.get("key", "data"))
            elif method == "to_stata":
                fn(target, write_index=False)
            elif method == "to_latex":
                with open(target, "w") as fh:
                    fh.write(pdf.to_latex(index=False))
            elif method == "to_excel":
                fn(target, index=False)
            else:
                fn(target)
        elif fmt in _SPARK_WRITERS:
            writer = df.write.mode(mode)
            if fmt == "csv":
                writer = writer.option("header", "true")
            if options:
                writer = writer.options(
                    **{k: str(v) for k, v in options.items()}
                )
            getattr(writer, fmt)(target)
        else:
            raise ValueError(f"unsupported export format {fmt!r}")
        written.append(target)
    return written


def save_or_load(
    spark: SparkSession,
    path: str,
    arr=None,
    *,
    task: str = "save",
):
    """numpy array <-> parquet round-trip (save_or_load,
    gofast/core/io.py:1423 saves ``.npy``/``.npz``).

    1-D/2-D arrays persist as (row_id, values array<double>) parquet — a
    splittable, schema-carrying format instead of the reference's raw npy.
    Driver-side ndarray marshalling by contract (arrays are small);
    at scale data should already live in frames.
    """
    import numpy as np

    if task == "save":
        if arr is None:
            raise ValueError("task='save' needs an array")
        a = np.asarray(arr, dtype=float)
        a2 = a.reshape(len(a), -1)
        rows = [(i, [float(v) for v in row]) for i, row in enumerate(a2)]
        df = spark.createDataFrame(rows, "row_id bigint, values array<double>")
        df.write.mode("overwrite").parquet(path)
        return path
    if task == "load":
        rows = spark.read.parquet(path).orderBy("row_id").collect()
        out = np.array([r["values"] for r in rows])
        return out[:, 0] if out.shape[1] == 1 else out
    raise ValueError("task must be save|load")


def store_data(df: DataFrame, warehouse: str, name: str, *, mode: str = "overwrite") -> str:
    """Store a frame in a parquet warehouse directory under ``name``.

    Reference: the HDF5 store family (``store_or_retrieve_data`` /
    ``handle_datasets_with_hdfstore``, gofast/dataops/management.py:424,
    521) — parquet-per-table replaces the HDF5 keys: splittable,
    column-pruned, predicate-pushed.
    """
    target = os.path.join(warehouse, name)
    df.write.mode(mode).parquet(target)
    return target


def retrieve_data(spark: SparkSession, warehouse: str, name: str) -> DataFrame:
    """Load a named frame from the parquet warehouse (lazy scan)."""
    return spark.read.parquet(os.path.join(warehouse, name))


def list_stored(warehouse: str) -> list[str]:
    """Names available in the warehouse."""
    if not os.path.isdir(warehouse):
        return []
    return sorted(
        n for n in os.listdir(warehouse)
        if os.path.isdir(os.path.join(warehouse, n))
    )


def read_worksheets(
    spark: SparkSession, path: str, *, sheets: list[str] | None = None
) -> dict[str, DataFrame]:
    """Multi-sheet Excel -> dict of frames (read_worksheets,
    gofast/utils/data_utils.py:3864).  Driver-side pandas parse
    (small-data contract), distributed frames out.  Without an Excel
    engine (openpyxl/xlrd) falls back to the stdlib SpreadsheetML
    reader in :mod:`gofast_spark.sources.xlsx` — first row is the
    header, numeric columns coerce."""
    import pandas as pd

    try:
        book = pd.read_excel(path, sheet_name=sheets)  # None -> all sheets
        if not isinstance(book, dict):
            book = {(sheets[0] if sheets else "Sheet1"): book}
    except ImportError:
        from gofast_spark.sources.xlsx import read_xlsx_stdlib

        def _coerce(s):
            try:
                return pd.to_numeric(s)
            except (ValueError, TypeError):
                return s

        book = {}
        for name, rows in read_xlsx_stdlib(path).items():
            if sheets is not None and name not in sheets:
                continue
            if len(rows) < 1:
                continue
            header = [str(h) for h in rows[0]]
            book[name] = pd.DataFrame(rows[1:], columns=header).apply(_coerce)
    return {name: spark.createDataFrame(pdf) for name, pdf in book.items()}


def request_data(
    spark: SparkSession,
    url: str,
    *,
    fetcher=None,
    **options,
) -> DataFrame:
    """HTTP fetch -> DataFrame (request_data,
    gofast/dataops/management.py:202).

    ``fetcher(url, **options)`` must return JSON-decodable text or a list
    of records; defaults to urllib.  Injectable fetcher keeps the
    operator testable offline and lets callers swap in authenticated
    clients.  Driver-side by contract.
    """
    import json

    if fetcher is None:
        def fetcher(u, **kw):  # pragma: no cover - needs network
            from urllib.request import urlopen

            with urlopen(u, timeout=kw.get("timeout", 30)) as resp:
                return resp.read().decode("utf-8")

    payload = fetcher(url, **options)
    records = json.loads(payload) if isinstance(payload, str) else payload
    if isinstance(records, dict):
        records = [records]
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(records))


def fetch_remote_data(
    url: str,
    dest: str,
    *,
    opener=None,
    timeout: int = 60,
) -> str:
    """Download a raw remote file to a local/dbfs path
    (fetch_remote_data / get_remote_data,
    gofast/dataops/management.py:714, 310).  ``opener(url)`` must return
    bytes (injectable for auth/testing); defaults to urllib.  Driver-side
    by contract — at scale, land data via the distributed readers."""
    if opener is None:
        def opener(u):  # pragma: no cover - needs network
            from urllib.request import urlopen

            with urlopen(u, timeout=timeout) as resp:
                return resp.read()

    payload = opener(url)
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "wb") as f:
        f.write(payload)
    return dest


def scrape_web_data(
    spark: SparkSession,
    url: str,
    *,
    fetcher=None,
    table_index: int = 0,
    **options,
) -> DataFrame:
    """HTML table scrape -> DataFrame (scrape_web_data,
    gofast/dataops/management.py:849).

    Driver-side: fetch HTML (injectable ``fetcher`` for auth/testing),
    parse tables with ``pandas.read_html`` (needs lxml/bs4 — a clear
    ImportError otherwise), distribute the chosen table.
    """
    import pandas as pd

    if fetcher is None:
        def fetcher(u, **kw):  # pragma: no cover - needs network
            from urllib.request import urlopen

            with urlopen(u, timeout=kw.get("timeout", 30)) as resp:
                return resp.read().decode("utf-8")

    from io import StringIO

    html = fetcher(url, **options)
    try:
        tables = pd.read_html(StringIO(html))
    except ImportError:
        # lxml/bs4 absent: stdlib fallback keeps the operator usable in
        # hermetic environments (well-formed <table> markup only).
        def _coerce(s):
            try:
                return pd.to_numeric(s)
            except (ValueError, TypeError):
                return s

        tables = [
            pd.DataFrame(rows[1:], columns=rows[0]).apply(_coerce)
            for rows in _parse_html_tables(html)
            if len(rows) >= 2
        ]
    return spark.createDataFrame(tables[table_index])


def _parse_html_tables(html: str) -> list[list[list[str]]]:
    """Minimal ``<table>`` extractor on stdlib ``html.parser`` — the
    dependency-free fallback behind :func:`scrape_web_data` (reference
    requires lxml; ref gofast/dataops/management.py:849).  Returns one
    list of rows (lists of cell strings, ``th``/``td`` alike) per table;
    nested tables are flattened into the innermost open table."""
    from html.parser import HTMLParser

    class _TableParser(HTMLParser):
        def __init__(self):
            super().__init__()
            self.tables: list[list[list[str]]] = []
            self._stack: list[list[list[str]]] = []
            self._row: list[str] | None = None
            self._cell: list[str] | None = None

        def handle_starttag(self, tag, attrs):
            if tag == "table":
                self._stack.append([])
            elif tag == "tr" and self._stack:
                self._row = []
            elif tag in ("td", "th") and self._row is not None:
                self._cell = []

        def handle_endtag(self, tag):
            if tag in ("td", "th") and self._cell is not None:
                self._row.append("".join(self._cell).strip())
                self._cell = None
            elif tag == "tr" and self._row is not None:
                if self._stack and self._row:
                    self._stack[-1].append(self._row)
                self._row = None
            elif tag == "table" and self._stack:
                self.tables.append(self._stack.pop())

        def handle_data(self, data):
            if self._cell is not None:
                self._cell.append(data)

    p = _TableParser()
    p.feed(html)
    p.close()
    return p.tables


def dataset_registry() -> dict:
    """Name -> generator mapping for every packaged dataset (the
    reference's ``make_*``/``load_*`` surface, gofast/datasets/make.py:70,
    load.py:38)."""
    from gofast_spark.sources import datasets as _ds

    return {
        "regression": _ds.make_regression_data,
        "classification": _ds.make_classification_data,
        "sales": _ds.make_sales_data,
        "retail": _ds.make_retail_store,
        "market": _ds.make_financial_market_trends,
        "medical_diagnosis": _ds.make_medical_diagnosis,
        "gadget_sales": _ds.make_gadget_sales,
        "water_demand": _ds.make_water_demand,
        "social_media": _ds.make_social_media_comments,
        "african_demo": _ds.make_african_demo,
        "agronomy": _ds.make_agronomy_feedback,
        "mining_ops": _ds.make_mining_ops,
        "sounding": _ds.make_sounding,
        "well_logging": _ds.make_well_logging,
        "ert": _ds.make_ert,
        "tem": _ds.make_tem,
        "erp": _ds.make_erp,
        "elogging": _ds.make_elogging,
        "cc_factors": _ds.make_cc_factors,
        "system_dynamics": _ds.make_system_dynamics,
        "drill_ops": _ds.make_drill_ops,
        # named load_* datasets (gofast/datasets/load.py:38-1791) —
        # schema-faithful seeded generators, see sources.datasets
        "iris": _ds.load_iris,
        "statlog": _ds.load_statlog,
        "dyspnea": _ds.load_dyspnea,
        "hydro_metrics": _ds.load_hydro_metrics,
        "toc": _ds.load_toc,
        "bagoue": _ds.load_bagoue,
        "hlogs": _ds.load_hlogs,
        "nansha": _ds.load_nansha,
        "mxs": _ds.load_mxs,
        "forensic": _ds.load_forensic,
        "jrs_bet": _ds.load_jrs_bet,
    }


def load_dataset(spark: SparkSession, name: str, **kwargs) -> DataFrame:
    """Named dataset loader registry (the ``load_*`` family,
    gofast/datasets/load.py:38-1791).  The reference ships packaged CSVs;
    here every dataset is a seeded distributed generator, so ``load_*``
    semantics (same name -> same data) hold at any requested size."""
    registry = dataset_registry()
    if name not in registry:
        raise KeyError(f"unknown dataset {name!r}; available: {sorted(registry)}")
    return registry[name](spark, **kwargs)


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
