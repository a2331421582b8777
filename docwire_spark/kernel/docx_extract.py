"""Minimal DOCX (WordprocessingML) -> document-element event stream.

Covers the text-extraction subset of the reference's OOXML path
(reference: src/odf_ooxml_parser.cpp + src/common_xml_document_parser.cpp;
styling, numbering definitions, footnotes, drawings are out of scope).

The walk is GENERIC dispatch on local element name, exactly like the
reference's command-handler registry (common_xml_document_parser.cpp:
80-103): unknown elements descend into children, so e.g. the tab-stop
definitions in ``w:pPr/w:tabs/w:tab`` render as literal tab characters
— a reference quirk the goldens depend on (tests/3.docx.out items are
tab-prefixed because of it).

- p -> paragraph events; t -> text; tab -> "\\t"; br/cr -> break_line
- hyperlink -> link events, URL from document.xml.rels
- tbl/tr/tc -> table events (grid-rendered by the plain-text writer)
- commentReference -> comment event from word/comments.xml
  (author/date attrs, date kept as the RAW ISO string —
  odf_ooxml_parser.cpp:315-346)
- text nodes suppressed when all-whitespace (common_xml_document_
  parser.cpp onODFOOXMLText space_preserve rule)
- metadata from docProps/core.xml

Byte-parity gate: tests/N.docx.out goldens.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

from docwire_spark.kernel import events as E
from docwire_spark.kernel.xlsx_extract import _metadata as _core_metadata

_REL_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_XML_SPACE = "{http://www.w3.org/XML/1998/namespace}space"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _rels(zf: zipfile.ZipFile) -> dict:
    try:
        root = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
    except (KeyError, ET.ParseError):
        return {}
    return {
        rel.get("Id"): rel.get("Target")
        for rel in root.iter(f"{_REL_PKG}Relationship")
    }


def _attr(el, name: str):
    """Attribute by local name, any namespace."""
    for k, v in el.attrib.items():
        if _local(k) == name:
            return v
    return None


def _text_of(el) -> str:
    """Plain-text of a comment subtree: paragraphs append '\\n'
    (reference onODFOOXMLPara: text += children + '\\n'), tabs render,
    everything else concatenates."""
    parts = []

    def walk(node):
        name = _local(node.tag)
        if name == "tab":
            parts.append("\t")
        if node.text:
            parts.append(node.text)
        for child in node:
            walk(child)
            if child.tail:
                parts.append(child.tail)
        if name == "p":
            parts.append("\n")

    for child in el:
        walk(child)
    return "".join(parts)


def _comments(zf: zipfile.ZipFile) -> dict:
    try:
        root = ET.fromstring(zf.read("word/comments.xml"))
    except (KeyError, ET.ParseError):
        return {}
    out = {}
    for c in root:
        if _local(c.tag) != "comment":
            continue
        cid = _attr(c, "id")
        if cid is None:
            continue
        out[cid] = (
            _attr(c, "author") or "",
            _attr(c, "date") or "",
            _text_of(c),
        )
    return out


# field instructions / binary payloads the reference suppresses
_SKIP = frozenset(("fldData", "instrText", "binData", "tableStyleId"))


class _Walker:
    def __init__(self, rels: dict, comments: dict):
        self.rels = rels
        self.comments = comments
        self.events: list = []

    def _emit_text_node(self, s: str | None, preserve: bool) -> None:
        if not s:
            return
        if preserve or not s.isspace():
            self.events.append((E.TEXT, s))

    def walk(self, el, preserve: bool = False) -> None:
        ev = self.events
        name = _local(el.tag)
        if name in _SKIP:
            return
        # xml:space inherits; "default" RESETS an inherited preserve
        # (reference parseXmlData, common_xml_document_parser.cpp:
        # 540-548; exporters put it on w:document too — the
        # space_attributes_in_non_standard_places.docx fixture)
        sp = el.get(_XML_SPACE)
        if sp == "preserve":
            preserve = True
        elif sp == "default":
            preserve = False

        if name == "p":
            ev.append((E.PARAGRAPH, None))
        elif name == "tbl":
            ev.append((E.TABLE, None))
        elif name == "tr":
            ev.append((E.TABLE_ROW, None))
        elif name == "tc":
            ev.append((E.TABLE_CELL, None))
        elif name == "tab":
            ev.append((E.TEXT, "\t"))
        elif name in ("br", "cr"):
            ev.append((E.BREAK_LINE, None))
        elif name == "hyperlink":
            rid = _attr(el, "id")
            url = self.rels.get(rid, "") if rid else ""
            ev.append((E.LINK, (url or "", None)))
        elif name == "commentReference":
            c = self.comments.get(_attr(el, "id"))
            if c is not None:
                ev.append((E.COMMENT, c))

        self._emit_text_node(el.text, preserve)
        for child in el:
            self.walk(child, preserve)
            self._emit_text_node(child.tail, preserve)

        if name == "p":
            ev.append((E.CLOSE_PARAGRAPH, None))
        elif name == "tbl":
            ev.append((E.CLOSE_TABLE, None))
        elif name == "tr":
            ev.append((E.CLOSE_TABLE_ROW, None))
        elif name == "tc":
            ev.append((E.CLOSE_TABLE_CELL, None))
        elif name == "hyperlink":
            ev.append((E.CLOSE_LINK, None))


def pptx_to_events(data: bytes):
    """PPTX: each ppt/slides/slideN.xml in numeric order runs through
    the same local-name walker (reference odf_ooxml_parser.cpp:535-549
    — DrawingML a:p / a:t hit the same "p"/"t" command handlers;
    hyperlinks are NOT resolved on this path, matching the goldens).
    Page count = slide count (odf_ooxml_parser.cpp:686-695)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    walker = _Walker({}, {})
    events: list = [(E.DOCUMENT, None)]
    i = 1
    names = set(zf.namelist())
    while f"ppt/slides/slide{i}.xml" in names and i < 2500:
        try:
            root = ET.fromstring(zf.read(f"ppt/slides/slide{i}.xml"))
        except ET.ParseError:
            break
        walker.walk(root)
        i += 1
    events.extend(walker.events)
    events.append((E.CLOSE_DOCUMENT, None))
    meta = _core_metadata(zf)
    meta.setdefault("page_count", i - 1)
    return events, meta


def docx_to_events(data: bytes):
    """Returns (events, meta)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    root = ET.fromstring(zf.read("word/document.xml"))
    body = None
    for child in root:
        if _local(child.tag) == "body":
            body = child
            break
    walker = _Walker(_rels(zf), _comments(zf))
    events: list = [(E.DOCUMENT, None)]
    preserve = (
        root.get(_XML_SPACE) == "preserve"
        or (body is not None and body.get(_XML_SPACE) == "preserve")
    )
    if body is not None:
        for child in body:
            walker.walk(child, preserve)
    events.extend(walker.events)
    events.append((E.CLOSE_DOCUMENT, None))
    return events, _core_metadata(zf)
