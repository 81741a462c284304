"""Sources extras: array round-trip, parquet warehouse, frame builders,
synthetic generators, injectable HTTP fetch."""

from __future__ import annotations

import json

import pytest


def test_save_or_load_roundtrip(spark, tmp_path):
    import numpy as np

    from gofast_spark.sources.io import save_or_load

    a2 = np.arange(12, dtype=float).reshape(3, 4)
    p = str(tmp_path / "arr2d")
    save_or_load(spark, p, a2, task="save")
    back = save_or_load(spark, p, task="load")
    assert back.shape == (3, 4) and (back == a2).all()

    a1 = np.array([1.5, 2.5, 3.5])
    p1 = str(tmp_path / "arr1d")
    save_or_load(spark, p1, a1, task="save")
    back1 = save_or_load(spark, p1, task="load")
    assert (back1 == a1).all()


def test_warehouse_store_retrieve(spark, tmp_path):
    from gofast_spark.sources.io import list_stored, retrieve_data, store_data

    wh = str(tmp_path / "wh")
    df = spark.range(10).withColumnRenamed("id", "k")
    store_data(df, wh, "numbers")
    store_data(df.where("k < 3"), wh, "small")
    assert list_stored(wh) == ["numbers", "small"]
    assert retrieve_data(spark, wh, "small").count() == 3


def test_build_df_variants(spark):
    from gofast_spark.sources.datasets import build_df, make_df

    d = build_df(spark, {"a": [1, 2], "b": ["x", "y"]})
    assert d.count() == 2 and set(d.columns) == {"a", "b"}
    d2 = make_df(spark, [(1, "x"), (2, "y")], columns=["k", "v"])
    assert d2.columns == ["k", "v"]


def test_make_generators_shapes(spark):
    from gofast_spark.sources.datasets import (
        make_classification_data,
        make_regression_data,
        make_sales_data,
    )

    r = make_regression_data(spark, 200, 3)
    assert r.count() == 200 and {"x_0", "x_1", "x_2", "y"} <= set(r.columns)
    c = make_classification_data(spark, 100, 2, n_classes=3)
    labels = {row["label"] for row in c.select("label").distinct().collect()}
    assert labels == {0, 1, 2}
    s = make_sales_data(spark, 500, n_stores=5)
    assert s.count() == 500
    stores = s.select("store_id").distinct().count()
    assert stores == 5
    # revenue = quantity * unit_price (rounded)
    bad = s.where("abs(revenue - round(quantity * unit_price, 2)) > 1e-9").count()
    assert bad == 0


def test_request_data_with_injected_fetcher(spark):
    from gofast_spark.sources.io import request_data

    payload = json.dumps([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    out = request_data(spark, "http://example.invalid/data", fetcher=lambda u, **kw: payload)
    assert out.count() == 2 and set(out.columns) == {"id", "v"}


def test_read_worksheets_if_engine_available(spark, tmp_path):
    pd = pytest.importorskip("pandas")
    pytest.importorskip("openpyxl")
    from gofast_spark.sources.io import read_worksheets

    p = str(tmp_path / "book.xlsx")
    with pd.ExcelWriter(p) as w:
        pd.DataFrame({"a": [1, 2]}).to_excel(w, sheet_name="s1", index=False)
        pd.DataFrame({"b": [3]}).to_excel(w, sheet_name="s2", index=False)
    book = read_worksheets(spark, p)
    assert set(book) == {"s1", "s2"}
    assert book["s1"].count() == 2


def test_fetch_remote_data_injected(spark, tmp_path):
    from gofast_spark.sources.io import fetch_remote_data

    dest = str(tmp_path / "dl" / "payload.bin")
    out = fetch_remote_data(
        "http://x.invalid/file", dest, opener=lambda u: b"\x01\x02\x03"
    )
    with open(out, "rb") as f:
        assert f.read() == b"\x01\x02\x03"


def test_fill_mode_and_time_grid(spark):
    from pyspark.sql import functions as F

    from gofast_spark.quality import handle_missing_data
    from gofast_spark.ts import time_step_grid

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 7.0), (4, None)], ["id", "v"]
    )
    out = handle_missing_data(df, "fill_mode", columns=["v"])
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[4] == 5.0  # mode fills the gap

    grid = time_step_grid(
        spark, "2024-01-01 00:00:00", "2024-01-01 01:00:00", step_seconds=900
    )
    assert grid.count() == 5  # 0,15,30,45,60 min
    first = grid.agg(F.min("ts"), F.max("ts")).first()
    assert str(first[0]).startswith("2024-01-01 00:00")


def test_read_fwf(spark, tmp_path):
    from gofast_spark.sources.io import read_data

    p = tmp_path / "table.fwf"
    p.write_text("id  name   val\n1   alpha  10\n2   beta   20\n")
    df = read_data(spark, str(p))
    assert df.count() == 2
    assert [c.lower() for c in df.columns] == ["id", "name", "val"]


def test_read_sas_gated(spark, tmp_path):
    """A malformed .sas7bdat must surface pandas' reader error, proving
    the dispatch reaches read_sas (no real SAS fixture in-container)."""
    import pytest

    from gofast_spark.sources.io import read_data

    p = tmp_path / "x.sas7bdat"
    p.write_bytes(b"not a real sas file")
    with pytest.raises(Exception):
        read_data(spark, str(p))


def test_export_pandas_formats_roundtrip(spark, tmp_path):
    """feather / stata / tex driver-side sinks (reference writer matrix
    gofast/api/property.py:2827-2845) round-trip through read_data."""
    from gofast_spark.sources.io import export_data, read_data

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], ["id", "name", "v"]
    )
    base = str(tmp_path / "out")
    written = export_data(df, base, ["feather", "stata", "tex"])
    assert [w.rsplit(".", 1)[1] for w in written] == ["feather", "stata", "tex"]

    back_f = read_data(spark, base + ".feather")
    assert sorted(r["id"] for r in back_f.collect()) == [1, 2]
    back_s = read_data(spark, base + ".stata")
    assert sorted(r["name"] for r in back_s.collect()) == ["a", "b"]
    tex = open(base + ".tex").read()
    assert "tabular" in tex and "2.5" in tex


def test_export_unknown_format_raises(spark, tmp_path):
    import pytest

    from gofast_spark.sources.io import export_data

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="unsupported export format"):
        export_data(df, str(tmp_path / "o"), ["gbq"])


def test_export_spark_and_pandas_mix(spark, tmp_path):
    from gofast_spark.sources.io import export_data, read_data

    df = spark.createDataFrame([(1, 2.0), (2, 4.0)], ["k", "v"])
    base = str(tmp_path / "mix")
    export_data(df, base, ["parquet", "feather"])
    assert read_data(spark, base + ".parquet").count() == 2
    assert read_data(spark, base + ".feather").count() == 2


def test_fetch_data_tag_resolution(spark):
    """Multi-word names with stage suffixes resolve by longest joined
    prefix; load_/make_ prefixes strip only at the start; unknown tags
    raise KeyError listing the registry."""
    import pytest

    from gofast_spark.sources.datasets import fetch_data

    assert fetch_data(spark, "cc factors preprocessed").count() > 0
    assert fetch_data(spark, "CC-Factors").count() > 0
    assert fetch_data(spark, "load_iris prepared").count() == 150
    with pytest.raises(KeyError, match="available"):
        fetch_data(spark, "no such dataset anywhere")


def test_parse_html_tables_stdlib():
    from gofast_spark.sources.io import _parse_html_tables

    html = (
        "<div><table id='a'>"
        "<tr><th>x</th><th>y</th></tr>"
        "<tr><td> 1 </td><td>alpha</td></tr>"
        "<tr><td>2</td><td>beta &amp; co</td></tr>"
        "</table>stray text<table>"
        "<tr><td>only</td></tr>"
        "</table></div>"
    )
    tables = _parse_html_tables(html)
    assert len(tables) == 2
    assert tables[0] == [["x", "y"], ["1", "alpha"], ["2", "beta & co"]]
    assert tables[1] == [["only"]]
    # malformed: unclosed cell/row still yields captured rows
    assert _parse_html_tables("<table><tr><td>a</td></tr>") == []
    assert _parse_html_tables("no tables here") == []


def test_scrape_web_data_stdlib_fallback(spark):
    from gofast_spark.sources import scrape_web_data

    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td>1</td></tr>"
        "<tr><td>b</td><td>2</td></tr></table>"
    )
    df = scrape_web_data(spark, "http://x.invalid", fetcher=lambda u, **k: html)
    rows = {r["k"]: r["v"] for r in df.collect()}
    assert rows == {"a": 1, "b": 2}


def test_xlsx_stdlib_roundtrip(spark, tmp_path):
    from gofast_spark.sources.io import read_worksheets
    from gofast_spark.sources.xlsx import read_xlsx_stdlib, write_xlsx_stdlib

    path = str(tmp_path / "book.xlsx")
    write_xlsx_stdlib(
        path,
        {
            "s1": [["a", "b"], [1, "x<&>y"], [2.5, None]],
            "s2": [["only"], ["v"]],
        },
    )
    raw = read_xlsx_stdlib(path)
    assert list(raw) == ["s1", "s2"]
    assert raw["s1"][0] == ["a", "b"]
    assert raw["s1"][1] == [1.0, "x<&>y"]
    assert raw["s1"][2] == [2.5, None]

    frames = read_worksheets(spark, path, sheets=["s1"])
    assert list(frames) == ["s1"]
    rows = sorted(map(tuple, frames["s1"].collect()))
    assert rows == [(1.0, "x<&>y"), (2.5, None)]


def test_xlsx_stdlib_shared_strings(tmp_path):
    """Reader handles sharedStrings (what real Excel exports emit), even
    though our minimal writer uses inline strings."""
    import zipfile

    from gofast_spark.sources.xlsx import read_xlsx_stdlib

    path = str(tmp_path / "shared.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<workbook {ns}><sheets><sheet name="data" sheetId="1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/sharedStrings.xml",
            f'<sst {ns}><si><t>hello</t></si><si><t>wor</t><t>ld</t></si></sst>',
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet {ns}><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    raw = read_xlsx_stdlib(path)
    assert raw["data"] == [["hello", None, "world"]]
