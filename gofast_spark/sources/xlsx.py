"""Dependency-free xlsx read/write on stdlib zipfile + ElementTree.

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML,
public spec).  pandas needs openpyxl/xlrd for Excel; this module keeps
the reference's worksheet surface (read_worksheets,
gofast/utils/data_utils.py:3864) usable in hermetic environments:

- :func:`read_xlsx_stdlib` — sheet-name -> list-of-rows for the common
  subset real exports use (shared strings, inline strings, numeric
  cells, arbitrary sheet order via the workbook relationships part).
- :func:`write_xlsx_stdlib` — minimal writer (inline strings + numbers),
  enough for round-trip tests and small exports.

Driver-side by contract, like every non-splittable format here: parse on
the driver, distribute with ``createDataFrame``.  At scale, land data as
parquet/csv instead.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 (base-26 bijective)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_xlsx_stdlib(path: str) -> dict[str, list[list]]:
    """Every sheet as a list of rows (cells: str | float | None)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        rels = {}
        rel_part = "xl/_rels/workbook.xml.rels"
        if rel_part in z.namelist():
            for rel in ET.fromstring(z.read(rel_part)).iter(
                f"{_NS_PR}Relationship"
            ):
                target = rel.get("Target", "")
                rels[rel.get("Id")] = (
                    target if target.startswith("xl/") else f"xl/{target}"
                )

        out: dict[str, list[list]] = {}
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        for i, sheet in enumerate(wb.iter(f"{_NS}sheet")):
            name = sheet.get("name", f"Sheet{i + 1}")
            part = rels.get(
                sheet.get(f"{_NS_R}id"), f"xl/worksheets/sheet{i + 1}.xml"
            )
            rows: list[list] = []
            for row in ET.fromstring(z.read(part)).iter(f"{_NS}row"):
                cells: list = []
                for c in row.iter(f"{_NS}c"):
                    m = _CELL_REF.match(c.get("r", ""))
                    idx = _col_index(m.group(1)) if m else len(cells)
                    while len(cells) < idx:
                        cells.append(None)
                    t = c.get("t", "n")
                    v = c.find(f"{_NS}v")
                    if t == "s":
                        cells.append(shared[int(v.text)] if v is not None else None)
                    elif t == "inlineStr":
                        is_el = c.find(f"{_NS}is")
                        cells.append(
                            "".join(
                                e.text or "" for e in is_el.iter(f"{_NS}t")
                            )
                            if is_el is not None
                            else None
                        )
                    elif t == "str":
                        cells.append(v.text if v is not None else None)
                    elif v is None or v.text is None:
                        cells.append(None)
                    else:
                        cells.append(float(v.text))
                rows.append(cells)
            width = max((len(r) for r in rows), default=0)
            out[name] = [r + [None] * (width - len(r)) for r in rows]
        return out


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return f'<c r="{ref}"><v>{v}</v></c>'
    s = (
        str(v)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )
    return f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'


def _col_ref(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def write_xlsx_stdlib(path: str, sheets: dict[str, list[list]]) -> str:
    """Write ``{sheet_name: rows}`` as a minimal valid xlsx; returns path."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
            f'"/>{overrides}</Types>',
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
            '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        sheet_tags = "".join(
            f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        sheet_rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{sheet_rels}</Relationships>',
        )
        for i, n in enumerate(names):
            rows_xml = "".join(
                f'<row r="{ri + 1}">'
                + "".join(
                    _cell_xml(f"{_col_ref(ci)}{ri + 1}", v)
                    for ci, v in enumerate(row)
                )
                + "</row>"
                for ri, row in enumerate(sheets[n])
            )
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main">'
                f"<sheetData>{rows_xml}</sheetData></worksheet>",
            )
    return path
