"""§2.1 sources/sinks catalog entries: writer-matrix round-trips,
export/save/warehouse surface, and the seeded dataset registry — the
implemented-but-never-driver-verified rows VERDICT r5 ranked as the bulk
of the remaining coverage gap.

Round-trip entries WRITE through the engine's sinks into a scratch dir
(`/tmp/gofast_spark_io`, overwritten per run so /tmp stays bounded), then
RE-READ through the engine's readers; the oracle runs on the original
table, so a hash match proves write+read fidelity end to end.

Dataset entries verify the generators' portable arithmetic (pmod key
derivations, date spines, expr columns) against DuckDB `range()` replays;
seeded `F.rand` columns — Spark-internal RNG, unreproducible in DuckDB by
design — are covered by bounds-invariant entries instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gofast_spark.plans.catalog import (
    _MONEY2_SQL,
    _U6_SQL,
    _money2,
    _t,
    _units6,
    query,
)

_TMP = "/tmp/gofast_spark_io"


def _scratch(name: str) -> str:
    d = os.path.join(_TMP, name)
    os.makedirs(d, exist_ok=True)
    return d


# ---------------------------------------------------------------------------
# Writer-matrix round-trips (export_data / PandasDataHandlers.writers,
# gofast/core/io.py:1137, gofast/api/property.py:2827-2845)
# ---------------------------------------------------------------------------


@query(
    "write_roundtrip_csv_nation",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
           CAST(n_regionkey AS INT) AS n_regionkey
    FROM nation
    """,
)
def write_roundtrip_csv_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed csv write + read_data re-read; hash equality with the
    source parquet proves the csv writer/reader pair is lossless for
    int/string columns (export_data csv leg, gofast/core/io.py:1137)."""
    from gofast_spark.sources import export_data, read_data

    base = os.path.join(_scratch("csv_nation"), "nation")
    export_data(_t(spark, sf_dir, "nation"), base, ["csv"])
    df = read_data(spark, base + ".csv")
    return df.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


@query(
    "write_roundtrip_json_orders",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='o_totalprice')})")} AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def write_roundtrip_json_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json writer + reader round-trip on orders; doubles survive the
    text round-trip bit-exactly (shortest-repr guarantee), verified by
    the micro-unit money sum matching the source-table oracle."""
    from gofast_spark.sources import export_data, read_data

    base = os.path.join(_scratch("json_orders"), "orders")
    src = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    export_data(src, base, ["json"])
    df = read_data(spark, base + ".json")
    return df.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        _money2(F.sum(_units6(F.col("o_totalprice")))).alias("total"),
    )


@query(
    "write_roundtrip_parquet_lineitem",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def write_roundtrip_parquet_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet writer round-trip on the fact table (store_data-style
    warehouse write), aggregated after re-read."""
    from gofast_spark.sources import export_data, read_data

    base = os.path.join(_scratch("parquet_lineitem"), "lineitem")
    src = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    export_data(src, base, ["parquet"])
    df = read_data(spark, base + ".parquet")
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
    )


@query(
    "write_roundtrip_orc_customer",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='c_acctbal')})")} AS bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def write_roundtrip_orc_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orc writer + reader round-trip (the columnar alternative the
    writer matrix exposes), aggregated after re-read."""
    from gofast_spark.sources import export_data, read_data

    base = os.path.join(_scratch("orc_customer"), "customer")
    export_data(_t(spark, sf_dir, "customer"), base, ["orc"])
    df = read_data(spark, base + ".orc")
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        _money2(F.sum(_units6(F.col("c_acctbal")))).alias("bal"),
    )


@query(
    "write_roundtrip_text_region",
    oracle="""
    SELECT CAST(r_regionkey AS INT) AS r_regionkey, r_name FROM region
    """,
)
def write_roundtrip_text_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text sink (one string column) + re-read + parse: the
    lowest-common-denominator leg of the writer matrix."""
    from gofast_spark.sources import export_data, read_data

    base = os.path.join(_scratch("text_region"), "region")
    src = _t(spark, sf_dir, "region").select(
        F.format_string("%d|%s", "r_regionkey", "r_name").alias("value")
    )
    export_data(src, base, ["text"])
    df = read_data(spark, base + ".text", fmt="text")
    parts = F.split(F.col("value"), r"\|")
    return df.select(
        parts.getItem(0).cast("int").alias("r_regionkey"),
        parts.getItem(1).alias("r_name"),
    )


@query(
    "export_feather_customer",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='c_acctbal')})")} AS bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def export_feather_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format export_data (distributed parquet + driver-side
    feather interchange) with the feather leg re-read through the pandas
    fallback reader — the bounded driver-side writer path, guarded by
    export_data's max_rows check."""
    from gofast_spark.sources import export_data, read_data

    base = os.path.join(_scratch("feather_customer"), "customer")
    export_data(_t(spark, sf_dir, "customer"), base, ["parquet", "feather"])
    df = read_data(spark, base + ".feather")
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        _money2(F.sum(_units6(F.col("c_acctbal")))).alias("bal"),
    )


@query(
    "read_data_pickle_nation",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
           CAST(n_regionkey AS INT) AS n_regionkey
    FROM nation
    """,
)
def read_data_pickle_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """export_data pickle leg + read_data's pandas-fallback reader
    (.pkl, PandasDataHandlers.parsers matrix,
    gofast/api/property.py:2781) — full-row fidelity on a small dim."""
    from gofast_spark.sources import export_data, read_data

    base = os.path.join(_scratch("pickle_nation"), "nation")
    export_data(_t(spark, sf_dir, "nation"), base, ["pickle"])
    df = read_data(spark, base + ".pickle", fmt=None)
    return df.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


@query(
    "read_data_tsv_part_types",
    oracle="""
    SELECT p_type, CAST(count(*) AS BIGINT) AS n
    FROM part GROUP BY p_type
    """,
)
def read_data_tsv_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tsv dialect of the extension-dispatch reader (tab separator is
    injected by extension, gofast/core/io.py:826)."""
    from gofast_spark.sources import read_data

    base = os.path.join(_scratch("tsv_part"), "part.tsv")
    src = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    src.write.mode("overwrite").option("header", "true").option(
        "sep", "\t"
    ).csv(base)
    df = read_data(spark, base)
    return df.groupBy("p_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "sanitize_messy_csv_nation",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
           CAST(n_regionkey AS INT) AS n_regionkey
    FROM nation
    """,
)
def sanitize_messy_csv_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read_data(sanitize=True) on a csv with messy headers — the
    column-name cleanup path of _read_data (gofast/core/io.py:726-780):
    'N NationKey ' -> n_nationkey etc."""
    from gofast_spark.sources import read_data

    base = os.path.join(_scratch("messy_nation"), "nation.csv")
    messy = _t(spark, sf_dir, "nation").toDF(
        "N NationKey ", "N Name!", "n regionkey"
    )
    messy.write.mode("overwrite").option("header", "true").csv(base)
    df = read_data(spark, base, sanitize=True)
    return df.select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


# ---------------------------------------------------------------------------
# save_or_load + parquet warehouse (HDF5 store family,
# gofast/core/io.py:1423, gofast/dataops/management.py:424,521)
# ---------------------------------------------------------------------------


@query(
    "save_or_load_roundtrip_range",
    oracle="""
    SELECT CAST(i AS BIGINT) AS row_id,
           CAST(i AS DOUBLE) AS v0,
           CAST(2 * i AS DOUBLE) + 0.5 AS v1
    FROM range(24) t(i)
    """,
)
def save_or_load_roundtrip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ndarray -> parquet -> ndarray round-trip (save_or_load,
    gofast/core/io.py:1423), re-framed for the hash compare."""
    import numpy as np

    from gofast_spark.sources import save_or_load

    path = os.path.join(_scratch("save_or_load"), "arr.parquet")
    arr = np.array([[float(i), 2.0 * i + 0.5] for i in range(24)])
    save_or_load(spark, path, arr, task="save")
    back = save_or_load(spark, path, task="load")
    rows = [(i, float(r[0]), float(r[1])) for i, r in enumerate(back)]
    return spark.createDataFrame(rows, "row_id bigint, v0 double, v1 double")


@query(
    "warehouse_store_retrieve_supplier",
    oracle=f"""
    SELECT CAST(s_nationkey AS INT) AS s_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='s_acctbal')})")} AS bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def warehouse_store_retrieve_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """store_data -> list_stored -> retrieve_data through the parquet
    warehouse (the HDF5-store replacement, splittable + predicate-pushed;
    gofast/dataops/management.py:424,521)."""
    from gofast_spark.sources import list_stored, retrieve_data, store_data

    wh = _scratch("warehouse")
    store_data(_t(spark, sf_dir, "supplier"), wh, "supplier")
    if "supplier" not in list_stored(wh):
        raise RuntimeError("warehouse listing lost the stored table")
    df = retrieve_data(spark, wh, "supplier")
    return df.groupBy(F.col("s_nationkey").cast("int").alias("s_nationkey")).agg(
        F.count(F.lit(1)).alias("n"),
        _money2(F.sum(_units6(F.col("s_acctbal")))).alias("bal"),
    )


# ---------------------------------------------------------------------------
# Seeded dataset registry (make_*/load_* families,
# gofast/datasets/make.py:70-3886, load.py:38-1791)
# ---------------------------------------------------------------------------


@query(
    "make_sales_portable_agg",
    oracle="""
    SELECT CAST(i * 7919 % 20 AS BIGINT) AS store_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(i * 31 % 9 + 1) AS BIGINT) AS qty,
           min(DATE '2024-01-01' + CAST(i % 365 AS INT)) AS d_min,
           max(DATE '2024-01-01' + CAST(i % 365 AS INT)) AS d_max
    FROM range(10000) t(i) GROUP BY 1
    """,
)
def make_sales_portable_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_sales_data's key/date/quantity derivations are pure pmod
    arithmetic over the row id — DuckDB replays them exactly from
    range(), proving the distributed generator's deterministic columns
    (make_sales flavor, gofast/datasets/make.py)."""
    from gofast_spark.sources.datasets import make_sales_data

    df = make_sales_data(spark, 10_000)
    return df.groupBy("store_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("quantity").cast("bigint")).alias("qty"),
        F.min("sale_date").alias("d_min"),
        F.max("sale_date").alias("d_max"),
    )


@query(
    "make_classification_label_counts",
    oracle="""
    SELECT CAST(i % 4 AS INT) AS label, CAST(count(*) AS BIGINT) AS n
    FROM range(1000) t(i) GROUP BY 1
    """,
)
def make_classification_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_classification_data's label derivation (pmod over the row
    id) replayed in DuckDB; the class-shifted feature draws are
    bounds-checked in dataset_bounds_invariant instead."""
    from gofast_spark.sources.datasets import make_classification_data

    df = make_classification_data(spark, 1000, n_classes=4)
    return df.groupBy("label").agg(F.count(F.lit(1)).alias("n"))


@query(
    "load_iris_target_counts",
    oracle="""
    SELECT CAST(i % 3 AS INT) AS target, CAST(count(*) AS BIGINT) AS n
    FROM range(150) t(i) GROUP BY 1
    """,
)
def load_iris_target_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """load_iris (gofast/datasets/load.py:1143 shape): the expr-spec
    target column is portable arithmetic; measurement bounds are covered
    by dataset_bounds_invariant."""
    from gofast_spark.sources.datasets import load_iris

    return load_iris(spark).groupBy("target").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "dataset_bounds_invariant",
    oracle="""
    SELECT CAST(1 AS INT) AS iris_ok, CAST(1 AS INT) AS statlog_ok,
           CAST(150 AS BIGINT) AS iris_n, CAST(270 AS BIGINT) AS statlog_n
    """,
)
def dataset_bounds_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkable-invariant oracle for the seeded RNG columns DuckDB
    cannot replay (Spark-internal XORShift): every uniform/int spec
    column must stay inside its declared bounds and the row counts must
    match the registry defaults.  A generator regression (seed handling,
    spec drift) flips the flag and fails the hash."""
    from gofast_spark.sources.datasets import load_iris, load_statlog

    iris = load_iris(spark).agg(
        (
            (F.min("sepal_length") >= 4.3) & (F.max("sepal_length") <= 7.9)
            & (F.min("sepal_width") >= 2.0) & (F.max("sepal_width") <= 4.4)
            & (F.min("petal_length") >= 1.0) & (F.max("petal_length") <= 6.9)
            & (F.min("petal_width") >= 0.1) & (F.max("petal_width") <= 2.5)
        ).cast("int").alias("iris_ok"),
        F.count(F.lit(1)).alias("iris_n"),
    )
    statlog = load_statlog(spark).agg(
        (
            F.min("age").between(29, 77) & F.max("age").between(29, 77)
            & F.min("chol").between(126, 564) & F.max("chol").between(126, 564)
            & F.min("oldpeak").between(0.0, 6.2) & F.max("oldpeak").between(0.0, 6.2)
            & (F.min("thal").isin(3, 6, 7)) & (F.max("thal").isin(3, 6, 7))
        ).cast("int").alias("statlog_ok"),
        F.count(F.lit(1)).alias("statlog_n"),
    )
    return iris.crossJoin(F.broadcast(statlog)).select(
        "iris_ok", "statlog_ok", "iris_n", "statlog_n"
    )


@query(
    "dataset_registry_counts",
    # expected literals generated once from the seeded defaults (stable
    # by construction; a default-size or schema-width change fails the
    # hash — which is the point)
    oracle="""
    SELECT name, CAST(n_rows AS BIGINT) AS n_rows, CAST(n_cols AS INT) AS n_cols
    FROM (VALUES ('african_demo', 50, 7),
           ('agronomy', 1000, 10),
           ('bagoue', 431, 10),
           ('cc_factors', 1000, 12),
           ('classification', 1000, 7),
           ('drill_ops', 1000, 7),
           ('dyspnea', 1000, 9),
           ('elogging', 1000, 4),
           ('erp', 1000, 8),
           ('ert', 1000, 6),
           ('forensic', 1000, 8),
           ('gadget_sales', 1500, 7),
           ('hlogs', 1000, 13),
           ('hydro_metrics', 1000, 7),
           ('iris', 150, 6),
           ('jrs_bet', 1000, 5),
           ('market', 1000, 10),
           ('medical_diagnosis', 1000, 16),
           ('mining_ops', 1000, 13),
           ('mxs', 1000, 7),
           ('nansha', 1000, 10),
           ('regression', 1000, 7),
           ('retail', 1000, 7),
           ('sales', 10000, 7),
           ('social_media', 1000, 5),
           ('sounding', 800, 5),
           ('statlog', 270, 15),
           ('system_dynamics', 1000, 8),
           ('tem', 1000, 6),
           ('toc', 1000, 11),
           ('water_demand', 700, 9),
           ('well_logging', 1000, 6)) AS t(name, n_rows, n_cols)
    """,
)
def dataset_registry_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every registry generator builds, with its default row count and
    schema width — the breadth check over the whole make_*/load_*
    surface (gofast/datasets/make.py:70, load.py:38).  Count jobs are
    tiny (seeded spark.range generators)."""
    from gofast_spark.sources.io import dataset_registry

    rows = []
    for name, fn in sorted(dataset_registry().items()):
        d = fn(spark)
        rows.append((name, d.count(), len(d.columns)))
    return spark.createDataFrame(rows, "name string, n_rows bigint, n_cols int")


# ---------------------------------------------------------------------------
# Remaining never-driver-verified §2.2/§2.7/§2.8 surface + misc sources
# ---------------------------------------------------------------------------


@query(
    "features_in_lineitem",
    oracle="""
    SELECT * FROM (VALUES
      ('l_orderkey', 'numeric'), ('l_partkey', 'numeric'),
      ('l_suppkey', 'numeric'), ('l_linenumber', 'numeric'),
      ('l_quantity', 'numeric'), ('l_extendedprice', 'numeric'),
      ('l_discount', 'numeric'), ('l_tax', 'numeric'),
      ('l_returnflag', 'categorical'), ('l_linestatus', 'categorical'),
      ('l_shipdate', 'categorical')) AS t(col_name, kind)
    """,
)
def features_in_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-introspection split into numeric/categorical feature lists
    (features_in, gofast/core/checks.py:2548), pinned against the
    lineitem schema."""
    from gofast_spark.operators import features_in

    num, cat = features_in(_t(spark, sf_dir, "lineitem"))
    rows = [(c, "numeric") for c in num] + [(c, "categorical") for c in cat]
    return spark.createDataFrame(rows, "col_name string, kind string")


@query(
    "is_in_if_orders_columns",
    oracle="""
    SELECT 'o_missing_col' AS missing, CAST(1 AS INT) AS present_ok
    """,
)
def is_in_if_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership check with error policy (is_in_if,
    gofast/core/checks.py:1557): present probe passes, absent probe is
    returned as the diff under error='ignore'."""
    from gofast_spark.operators import is_in_if

    o = _t(spark, sf_dir, "orders")
    present_ok = is_in_if(o, ["o_orderkey", "o_orderstatus"])
    diff = is_in_if(
        o, ["o_orderkey", "o_missing_col"], error="ignore", return_diff=True
    )
    return spark.createDataFrame(
        [(diff[0], int(present_ok))], "missing string, present_ok int"
    )


@query(
    "frames_compare_nation",
    oracle="""
    SELECT CAST(1 AS INT) AS same_ok, CAST(0 AS INT) AS diff_ok
    """,
)
def frames_compare_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset frame equality (Frames.compare,
    gofast/dataops/core.py:588): a frame equals itself and differs from
    a perturbed copy."""
    from gofast_spark.operators import compare_frames

    n = _t(spark, sf_dir, "nation")
    perturbed = n.withColumn(
        "n_regionkey", F.col("n_regionkey") + F.lit(1)
    )
    return spark.createDataFrame(
        [(int(compare_frames(n, n)), int(compare_frames(n, perturbed)))],
        "same_ok int, diff_ok int",
    )


@query(
    "request_data_mock_records",
    oracle="""
    SELECT id, name, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'alpha', 10.5), (2, 'beta', 20.25),
                 (3, 'gamma', 30.0)) AS t(id, name, score)
    """,
)
def request_data_mock_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP-fetch operator driven through its injectable fetcher
    (request_data, gofast/dataops/management.py:202) — the JSON decode +
    frame construction path, network-free."""
    from gofast_spark.sources import request_data

    payload = (
        '[{"id": 1, "name": "alpha", "score": 10.5},'
        ' {"id": 2, "name": "beta", "score": 20.25},'
        ' {"id": 3, "name": "gamma", "score": 30.0}]'
    )
    df = request_data(
        spark, "https://example.invalid/api", fetcher=lambda u, **kw: payload
    )
    return df.select("id", "name", "score")


@query(
    "fetch_remote_file_csv",
    oracle="""
    SELECT CAST(id AS INTEGER) AS id, city, CAST(pop AS BIGINT) AS pop
    FROM (VALUES (1, 'accra', 2557000), (2, 'lagos', 14862000),
                 (3, 'nairobi', 4397000)) AS t(id, city, pop)
    ORDER BY id
    """,
)
def fetch_remote_file_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-file landing driven through the injectable opener
    (fetch_remote_data / get_remote_data, gofast/dataops/management.py:714,
    310), network-free: opener returns the raw bytes, the operator lands
    them at dest, and Spark's distributed csv reader takes over — the
    land-then-scan pattern a cluster ingest would use."""
    from gofast_spark.sources import fetch_remote_data

    body = b"id,city,pop\n1,accra,2557000\n2,lagos,14862000\n3,nairobi,4397000\n"
    dest = os.path.join(_scratch("fetch_remote"), "cities.csv")
    landed = fetch_remote_data(
        "https://example.invalid/cities.csv", dest, opener=lambda u: body
    )
    df = spark.read.csv(landed, header=True, inferSchema=True)
    return df.select(
        F.col("id").cast("int"),
        "city",
        F.col("pop").cast("bigint"),
    ).orderBy("id")


@query(
    "scrape_web_table_inline",
    oracle="""
    SELECT rank, name, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'ada', 9.5), (2, 'grace', 8.75), (3, 'edsger', 8.5))
      AS t(rank, name, score)
    ORDER BY rank
    """,
)
def scrape_web_table_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-table scrape through the injected fetcher over an inline
    literal (scrape_web_data, gofast/dataops/management.py:849) — fully
    hermetic: exercises the stdlib html.parser fallback (no lxml/bs4 in
    this environment) plus numeric coercion and frame distribution."""
    from gofast_spark.sources import scrape_web_data

    html = (
        "<html><body><h1>Leaderboard</h1><table>"
        "<tr><th>rank</th><th>name</th><th>score</th></tr>"
        "<tr><td>1</td><td>ada</td><td>9.5</td></tr>"
        "<tr><td>2</td><td>grace</td><td>8.75</td></tr>"
        "<tr><td>3</td><td>edsger</td><td>8.5</td></tr>"
        "</table></body></html>"
    )
    df = scrape_web_data(
        spark, "https://example.invalid/board", fetcher=lambda u, **kw: html
    )
    return df.select(
        F.col("rank").cast("int"),
        "name",
        F.col("score").cast("double"),
    ).orderBy("rank")


@query(
    "partitioned_write_orders",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           {_MONEY2_SQL.format(s=f"sum({_U6_SQL.format(x='o_totalprice')})")} AS total
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus
    """,
)
def partitioned_write_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet write + partition-pruned re-read:
    the warehouse layout store_data would use for a partitioned table;
    the filter on the partition column must prune directories (plan
    asserted in tests/test_plans.py) and the pruned aggregate must equal
    the source-table oracle."""
    root = os.path.join(_scratch("part_orders"), "orders_by_status")
    src = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(root)
    back = spark.read.parquet(root).where(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        _money2(F.sum(_units6(F.col("o_totalprice")))).alias("total"),
    )


@query(
    "read_worksheets_xlsx",
    oracle="""
    SELECT sheet, k, CAST(v AS DOUBLE) AS v
    FROM (VALUES ('inventory', 'bolt', 12.0), ('inventory', 'nut', 40.5),
                 ('prices', 'bolt', 0.25), ('prices', 'nut', 0.1))
      AS t(sheet, k, v)
    ORDER BY sheet, k
    """,
)
def read_worksheets_xlsx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sheet xlsx written and read back entirely through the stdlib
    SpreadsheetML path (read_worksheets, gofast/utils/data_utils.py:3864;
    no openpyxl/xlrd in this environment) — sheet order, shared/inline
    strings, numeric coercion."""
    from gofast_spark.sources.io import read_worksheets
    from gofast_spark.sources.xlsx import write_xlsx_stdlib

    path = os.path.join(_scratch("xlsx"), "book.xlsx")
    write_xlsx_stdlib(
        path,
        {
            "inventory": [["k", "v"], ["bolt", 12.0], ["nut", 40.5]],
            "prices": [["k", "v"], ["bolt", 0.25], ["nut", 0.1]],
        },
    )
    frames = read_worksheets(spark, path)
    out = None
    for name, df in frames.items():
        tagged = df.select(F.lit(name).alias("sheet"), "k", F.col("v").cast("double"))
        out = tagged if out is None else out.unionByName(tagged)
    return out.orderBy("sheet", "k")


@query(
    "array2hdf5_roundtrip",
    oracle="""
    SELECT CAST(i // 4 AS BIGINT) AS row_id,
           CAST(round(sum(sin(i)), 6) AS DOUBLE) AS row_sum
    FROM range(24) r(i) GROUP BY 1 ORDER BY 1
    """,
)
def array2hdf5_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D ndarray -> parquet(row_id, array<double>) -> per-row sums:
    the array2hdf5 analog (gofast/utils/base_utils.py:3637) on a
    splittable columnar store instead of HDF5.  The deterministic
    sin-grid array is reproducible in SQL, so the round-trip is
    hash-checked end to end."""
    import math

    from gofast_spark.sources import save_or_load

    arr = [[math.sin(r * 4 + c) for c in range(4)] for r in range(6)]
    path = os.path.join(_scratch("arr2d"), "grid.parquet")
    save_or_load(spark, path, arr, task="save")
    back = spark.read.parquet(path)
    return (
        back.select(
            "row_id",
            F.round(
                F.aggregate("values", F.lit(0.0), lambda a, x: a + x), 6
            ).cast("double").alias("row_sum"),
        )
        .orderBy("row_id")
    )


@query(
    "compact_small_files_orders",
    oracle="""
    SELECT CAST(64 AS INT) AS files_before, CAST(4 AS INT) AS files_after,
           count(*) AS n_rows,
           CAST(sum(CAST(trunc(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS price_c
    FROM orders
    """,
)
def compact_small_files_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (operators/maintenance.py compact_files; no
    gofast analog — the daily lakehouse hygiene job): a 64-way
    fragmented copy of orders is rewritten to 4 balanced files by one
    round-robin repartition; the stats frame plus a cent-exact price
    checksum of the COMPACTED table proves the rewrite lost nothing.
    At 100 TB this runs per partition-directory so the shuffle stays
    bounded."""
    from gofast_spark.operators.maintenance import compact_files

    frag = os.path.join(_scratch("compact"), "frag")
    out = os.path.join(_scratch("compact"), "out")
    _t(spark, sf_dir, "orders").repartition(64).write.mode(
        "overwrite"
    ).parquet(frag)
    stats = compact_files(spark, frag, out, target_files=4)
    check = spark.read.parquet(out).agg(
        F.sum(
            F.expr("CAST(o_totalprice * 100 + 0.5 AS BIGINT)")
        ).alias("price_c")
    )
    return stats.crossJoin(F.broadcast(check))


@query(
    "key_skew_report_orders",
    oracle="""
    WITH counts AS (
      SELECT o_custkey AS key, count(*) AS cnt FROM orders
      WHERE o_custkey IS NOT NULL GROUP BY o_custkey),
    t AS (SELECT sum(cnt) AS total, count(*) AS nkeys FROM counts)
    SELECT key, CAST(cnt AS BIGINT) AS cnt,
           CAST(floor(cnt * 1000000 / total) AS BIGINT) AS share_ppm,
           CAST(cnt / (total / CAST(nkeys AS DOUBLE)) AS DOUBLE)
             AS skew_factor
    FROM counts, t
    ORDER BY cnt DESC, key LIMIT 10
    """,
)
def key_skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg key hot-spot diagnosis (operators/maintenance.py
    key_skew_report; no gofast analog — the pre-flight check before any
    100-TB shuffle): top-10 heaviest customer keys with micro-unit
    share and skew factor from one groupBy + a 1-row broadcast of the
    count-table totals + TakeOrderedAndProject, deterministic
    (cnt DESC, key) tie-break."""
    from gofast_spark.operators.maintenance import key_skew_report

    return key_skew_report(_t(spark, sf_dir, "orders"), "o_custkey", top_k=10)


@query(
    "table_checksum_customer",
    oracle="""
    SELECT count(*) AS n_rows,
           bit_xor(CAST(('0x' || substr(md5(
             CAST(c_custkey AS VARCHAR) || chr(31) || c_name || chr(31)
             || c_mktsegment || chr(31)
             || CAST(CAST(trunc(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR)
           ), 1, 15)) AS BIGINT)) AS checksum
    FROM customer
    """,
)
def table_checksum_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum (operators/maintenance.py
    table_checksum; the replica-validation primitive after any
    copy/migration — no gofast analog): bit-XOR of the portable md5
    row hash over canonical column strings, partition- and
    row-order-independent by construction, overflow-free.  The oracle
    recomputes the identical digest in DuckDB — a hash match proves
    cross-engine content-equality checking works end to end."""
    from gofast_spark.operators.maintenance import table_checksum

    c = _t(spark, sf_dir, "customer")
    return table_checksum(
        c,
        [
            F.col("c_custkey"),
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.expr("CAST(c_acctbal * 100 + 0.5 AS BIGINT)"),
        ],
    )


@query(
    "partition_stats_orders",
    oracle="""
    SELECT o_orderpriority AS partition,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS min_o_totalprice,
           max(o_totalprice) AS max_o_totalprice,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS nulls_o_totalprice,
           min(o_orderdate) AS min_o_orderdate,
           max(o_orderdate) AS max_o_orderdate,
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS nulls_o_orderdate
    FROM orders GROUP BY 1
    """,
)
def partition_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping statistics per order priority
    (operators/maintenance.py partition_stats_report; the Parquet
    row-group min/max/null manifest readout) — one hash aggregate,
    partition-count-sized output."""
    from gofast_spark.operators.maintenance import partition_stats_report

    return partition_stats_report(
        _t(spark, sf_dir, "orders"), "o_orderpriority",
        ["o_totalprice", "o_orderdate"],
    )
