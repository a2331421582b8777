"""Minimal XLSX (SpreadsheetML) -> document-element event stream.

Covers the text-extraction subset of the reference's xls/ooxml path
(reference: src/xls_parser.cpp + src/odf_ooxml_parser.cpp; full ODF/
OOXML styling, number formats and charts are out of scope):

- sheets in workbook.xml order, each emitted as one table
- shared strings (t="s"), inline strings (t="inlineStr"/<is>), raw
  <v> text otherwise (numbers are stored in decimal text form — pass
  through verbatim)
- row/column gaps (r= refs) filled with empty rows/cells, matching
  the reference grid render (verified: tests/2.xlsx.out blank line
  for the missing row 5)
- metadata from docProps/core.xml (dc:creator, dcterms:created,
  cp:lastModifiedBy, dcterms:modified)

Byte-parity gate: tests/1..3.xlsx.out goldens + fourth.eml.out
(xlsx attachment parsed through the EML back-channel).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from docwire_spark.kernel import events as E
from docwire_spark.kernel.dates import parse_iso8601

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_CORE_NS = {
    "cp": "http://schemas.openxmlformats.org/package/2006/metadata/core-properties",
    "dc": "http://purl.org/dc/elements/1.1/",
    "dcterms": "http://purl.org/dc/terms/",
}

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """A -> 1, B -> 2, ..., AA -> 27."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_MAIN_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t")))
    return out


def _sheet_paths(zf: zipfile.ZipFile) -> list[str]:
    """Sheets in workbook order via workbook.xml.rels."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    except KeyError:
        return sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    targets = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{rel_ns}Relationship")
    }
    paths = []
    for sheet in wb.iter(f"{_MAIN_NS}sheet"):
        rid = sheet.get(f"{_REL_NS}id")
        target = targets.get(rid)
        if target:
            paths.append(
                target if target.startswith("xl/") else "xl/" + target
            )
    return paths


def _cell_text(cell, shared: list[str]) -> str:
    ctype = cell.get("t", "n")
    if ctype == "s":
        v = cell.find(f"{_MAIN_NS}v")
        try:
            return shared[int((v.text or "").strip())] if v is not None else ""
        except (ValueError, IndexError):
            return ""
    if ctype == "inlineStr":
        is_el = cell.find(f"{_MAIN_NS}is")
        if is_el is not None:
            return "".join(t.text or "" for t in is_el.iter(f"{_MAIN_NS}t"))
        return ""
    v = cell.find(f"{_MAIN_NS}v")
    return (v.text or "") if v is not None else ""


def _emit_sheet(events: list, zf: zipfile.ZipFile, path: str, shared) -> None:
    try:
        root = ET.fromstring(zf.read(path))
    except (KeyError, ET.ParseError):
        return
    sheet_data = root.find(f"{_MAIN_NS}sheetData")
    if sheet_data is None:
        return
    events.append((E.TABLE, None))
    next_row = 1
    for row in sheet_data.iter(f"{_MAIN_NS}row"):
        try:
            r = int(row.get("r", str(next_row)))
        except ValueError:
            r = next_row
        # fill skipped row numbers with empty rows (grid renders them
        # as blank lines)
        while next_row < r:
            events.append((E.TABLE_ROW, None))
            events.append((E.CLOSE_TABLE_ROW, None))
            next_row += 1
        events.append((E.TABLE_ROW, None))
        next_col = 1
        for cell in row.iter(f"{_MAIN_NS}c"):
            ref = cell.get("r", "")
            m = _CELL_REF.fullmatch(ref) if ref else None
            c = _col_index(m.group(1)) if m else next_col
            while next_col < c:
                events.append((E.TABLE_CELL, None))
                events.append((E.CLOSE_TABLE_CELL, None))
                next_col += 1
            events.append((E.TABLE_CELL, None))
            text = _cell_text(cell, shared)
            if text:
                events.append((E.TEXT, text))
            events.append((E.CLOSE_TABLE_CELL, None))
            next_col = c + 1
        events.append((E.CLOSE_TABLE_ROW, None))
        next_row = r + 1
    events.append((E.CLOSE_TABLE, None))


def _metadata(zf: zipfile.ZipFile) -> dict:
    try:
        core = ET.fromstring(zf.read("docProps/core.xml"))
    except (KeyError, ET.ParseError):
        return {}
    meta: dict = {}

    def text_of(tag):
        el = core.find(tag, _CORE_NS)
        return el.text if el is not None and el.text else None

    v = text_of("dc:creator")
    if v:
        meta["author"] = v
    v = text_of("cp:lastModifiedBy")
    if v:
        meta["last_modified_by"] = v
    v = text_of("dcterms:created")
    if v:
        dt = parse_iso8601(v)
        if dt:
            meta["creation_date"] = dt
    v = text_of("dcterms:modified")
    if v:
        dt = parse_iso8601(v)
        if dt:
            meta["last_modification_date"] = dt
    return meta


def xlsx_to_events(data: bytes):
    """Returns (events, meta)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    shared = _shared_strings(zf)
    events: list = [(E.DOCUMENT, None)]
    for path in _sheet_paths(zf):
        _emit_sheet(events, zf, path, shared)
    events.append((E.CLOSE_DOCUMENT, None))
    return events, _metadata(zf)
