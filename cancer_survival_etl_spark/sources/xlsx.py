"""Minimal stdlib .xlsx reader/writer (zipfile + XML — no openpyxl).

Closes the reference's last end-to-end gap (src/main.py:113, 227:
``pd.read_excel(path, sheet_name, skiprows)``) in environments without
a pandas Excel engine: an .xlsx file is a zip of XML parts, and the
subset the reference consumes — one worksheet grid of strings/numbers/
blanks with a header row after N junk rows — needs only
``xl/workbook.xml`` (sheet name → sheet id), the workbook rels (sheet
id → part path), ``xl/sharedStrings.xml`` (the string pool), and the
sheet part's ``<row>/<c>`` cells. SpreadsheetML reference: ECMA-376
part 1 §18 (public spec).

The writer emits the same subset (inline strings, no styles) so tests
can round-trip a real workbook file through the pipeline; it is also
the binary payload for the reference's local file sink (S7).

Driver-side by design: workbooks are O(10^4)-row publication files.
Anything lake-scale arrives as parquet/csv through ``spark.read``.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_PKG_REL_NS = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26 (base-26 bijective)."""
    idx = 0
    for ch in ref:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_text(c: ET.Element) -> str | None:
    v = c.find(f"{_NS}v")
    if v is not None:
        return v.text or ""
    is_el = c.find(f"{_NS}is")
    if is_el is not None:  # inline string: concat all text runs
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
    return None


def read_xlsx_rows(
    path: str, sheet_name: str
) -> list[tuple[int, dict[int, object]]]:
    """Raw sheet grid: one (1-based physical row number, column-index →
    value) pair per non-empty row. The row number comes from the
    ``r`` attribute, so blank physical rows keep their place —
    ``skiprows`` counts them exactly like ``pd.read_excel`` does.

    Values: shared/inline strings as ``str``, booleans as ``bool``,
    numbers as ``int`` when integral else ``float``, blanks absent.
    """
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(f"{_PKG_REL_NS}Relationship")
        }
        sheet_part = None
        for sh in wb.iter(f"{_NS}sheet"):
            if sh.get("name") == sheet_name:
                target = rel_target[sh.get(f"{_REL_NS}id")]
                sheet_part = target.lstrip("/")
                if not sheet_part.startswith("xl/"):
                    sheet_part = "xl/" + sheet_part
                break
        if sheet_part is None:
            names = [sh.get("name") for sh in wb.iter(f"{_NS}sheet")]
            raise KeyError(f"sheet {sheet_name!r} not in {names}")

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                )

        rows: list[tuple[int, dict[int, object]]] = []
        for seq, row in enumerate(
            ET.fromstring(zf.read(sheet_part)).iter(f"{_NS}row")
        ):
            rownum = int(row.get("r", seq + 1))
            cells: dict[int, object] = {}
            for c in row.iter(f"{_NS}c"):
                raw = _cell_text(c)
                if raw is None or raw == "":
                    continue
                m = _CELL_REF.match(c.get("r", ""))
                col = _col_index(m.group(1)) if m else len(cells)
                t = c.get("t", "n")
                if t == "s":
                    cells[col] = shared[int(raw)]
                elif t in ("str", "inlineStr"):
                    cells[col] = raw
                elif t == "b":
                    cells[col] = bool(int(raw))
                else:  # numeric
                    f = float(raw)
                    cells[col] = int(f) if f.is_integer() else f
            if cells:
                rows.append((rownum, cells))
    return rows


def read_xlsx_sheet(path: str, sheet_name: str, skiprows: int = 0):
    """``pd.read_excel(path, sheet_name, skiprows)`` on the stdlib
    reader: skip N physical rows, take the next as the header, type
    each column like pandas would (all-int → int64, numeric-with-
    missing → float64 + NaN, else object with None)."""
    import numpy as np
    import pandas as pd

    grid = [
        cells
        for rownum, cells in read_xlsx_rows(path, sheet_name)
        if rownum > skiprows
    ]
    if not grid:
        return pd.DataFrame()
    header_cells, data = grid[0], grid[1:]
    cols = [header_cells[i] for i in sorted(header_cells)]
    col_pos = sorted(header_cells)
    table = {
        name: [r.get(pos) for r in data]
        for name, pos in zip(cols, col_pos)
    }
    pdf = pd.DataFrame(table, columns=cols)
    for name in cols:
        s = pdf[name]
        vals = [v for v in s if v is not None]
        if vals and all(isinstance(v, (int, float)) for v in vals):
            if len(vals) == len(s) and all(isinstance(v, int) for v in vals):
                pdf[name] = s.astype("int64")
            else:
                pdf[name] = s.map(
                    lambda v: np.nan if v is None else float(v)
                ).astype("float64")
    return pdf


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
        f"{_xml_escape(str(value))}</t></is></c>"
    )


def _col_ref(idx: int) -> str:
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write a minimal valid .xlsx: one part per sheet, inline strings,
    no styles/sharedStrings. ``sheets`` maps sheet name → list of rows
    (lists of str/int/float/bool/None; None = blank cell)."""
    sheet_items = list(sheets.items())
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheet_items))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb_sheets = "".join(
        f'<sheet name="{_xml_escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _) in enumerate(sheet_items)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_items))
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (_, rows) in enumerate(sheet_items):
            body = "".join(
                f'<row r="{ri + 1}">'
                + "".join(
                    _cell_xml(f"{_col_ref(ci)}{ri + 1}", v)
                    for ci, v in enumerate(row)
                )
                + "</row>"
                for ri, row in enumerate(rows)
            )
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{body}</sheetData></worksheet>",
            )
