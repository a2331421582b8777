"""Minimal ODF (ODT/ODS/ODP) -> document-element event stream.

Covers the text-extraction subset of the reference's ODF path
(reference: src/odf_ooxml_parser.cpp + src/common_xml_document_parser.cpp
command handlers; full styling is out of scope):

- text:p / text:h -> paragraph events; text:span descends;
  text:s -> N spaces (c attr), text:tab -> tab, text:line-break ->
  break_line
- text:a -> link events (href attr)
- text:list + text:list-style automatic styles -> list events with
  decimal/disc per level (list-level-style-number vs bullet);
  list-header quirk replicated (stray close_list_item —
  common_xml_document_parser.cpp:402-417)
- table:table/-row/-cell -> table events
- office:annotation -> comment event (dc:creator, dc:date raw string,
  text:p content joined with newlines)
- metadata from meta.xml (meta:initial-creator -> author, dc:creator
  -> last_modified_by, meta:creation-date / dc:date,
  meta:document-statistic page-count/word-count)

Byte-parity gate: tests/N.odt.out / N.odp.out / N.ods.out goldens.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

from docwire_spark.kernel import events as E
from docwire_spark.kernel.dates import parse_iso8601


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _attr(el, name: str):
    for k, v in el.attrib.items():
        if _local(k) == name:
            return v
    return None


_OFFICE_BODY = (
    "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}body"
)


class _Walker:
    def __init__(self, zf: zipfile.ZipFile | None = None):
        self.zf = zf
        self.events: list = []
        self.list_styles: dict[str, list] = {}  # name -> [is_number]*10
        self.list_depth = 0
        # flat-ODF: structural events fire everywhere but TEXT nodes
        # are disabled until office:body (reference odfxml_parser.cpp
        # onODFBody/disableText); zipped ODF starts enabled
        self.suppress_text = False

    # -- list styles ----------------------------------------------------
    def scan_list_styles(self, root) -> None:
        for el in root.iter():
            if _local(el.tag) == "list-style":
                name = _attr(el, "name")
                if not name:
                    continue
                levels = [False] * 10
                for child in el:
                    try:
                        level = int(_attr(child, "level") or 1)
                    except ValueError:
                        level = 1
                    if 1 <= level <= 10:
                        levels[level - 1] = (
                            _local(child.tag) == "list-level-style-number"
                        )
                self.list_styles[name] = levels

    # -- walk -----------------------------------------------------------
    def _text_only(self, el) -> str:
        """Comment body text (events suppressed)."""
        parts = []
        if el.text:
            parts.append(el.text)
        for child in el:
            name = _local(child.tag)
            if name == "s":
                try:
                    parts.append(" " * int(_attr(child, "c") or 1))
                except ValueError:
                    parts.append(" ")
            elif name == "tab":
                parts.append("\t")
            elif name == "line-break":
                parts.append("\n")
            else:
                parts.append(self._text_only(child))
            if child.tail:
                parts.append(child.tail)
        return "".join(parts)

    def annotation(self, el) -> None:
        creator = date = ""
        content_parts = []
        for child in el:
            name = _local(child.tag)
            if name == "creator":
                creator = child.text or ""
            elif name == "date":
                date = child.text or ""
            elif name == "p":
                content_parts.append(self._text_only(child))
        self.events.append(
            (E.COMMENT, (creator, date, "\n".join(content_parts)))
        )

    def list(self, el) -> None:
        self.list_depth += 1
        style_name = _attr(el, "style-name") or ""
        is_number = False
        levels = self.list_styles.get(style_name)
        if levels and self.list_depth <= 10:
            is_number = levels[self.list_depth - 1]
        self.events.append(
            (E.LIST, ("decimal" if is_number else "disc", None))
        )
        for child in el:
            if _local(child.tag) != "list-header":
                self.events.append((E.LIST_ITEM, None))
                self.walk_children(child)
            else:
                self.walk_children(child)
            # reference quirk: close_list_item fires for list-header
            # children too (common_xml_document_parser.cpp:402-417)
            self.events.append((E.CLOSE_LIST_ITEM, None))
        self.list_depth -= 1
        self.events.append((E.CLOSE_LIST, None))

    def walk_children(self, el) -> None:
        for child in el:
            self.walk(child)

    def walk(self, el) -> None:
        ev = self.events
        name = _local(el.tag)
        if el.tag == _OFFICE_BODY:
            self.suppress_text = False
        if name in ("p", "h"):
            ev.append((E.PARAGRAPH, None))
            self._inline(el)
            ev.append((E.CLOSE_PARAGRAPH, None))
        elif name == "list":
            self.list(el)
        elif name == "table":
            ev.append((E.TABLE, None))
            self.walk_children(el)
            ev.append((E.CLOSE_TABLE, None))
        elif name == "table-row":
            ev.append((E.TABLE_ROW, None))
            self.walk_children(el)
            ev.append((E.CLOSE_TABLE_ROW, None))
        elif name == "table-cell":
            ev.append((E.TABLE_CELL, None))
            self.walk_children(el)
            ev.append((E.CLOSE_TABLE_CELL, None))
        elif name == "annotation":
            self.annotation(el)
        elif name == "object":
            self.object(el)
        elif name == "binary-data":
            pass  # base64 payloads skipped (odfxml_parser onODFBinaryData)
        else:
            self.walk_children(el)

    def object(self, el) -> None:
        """Embedded ODF object: parse <href>/content.xml inline
        (reference onODFObject, common_xml_document_parser.cpp:
        483-506 — events emitted with no nested document wrapper)."""
        if self.zf is None:
            # flat ODF: the object's markup is inline; walk it with
            # text disabled, then re-enable unconditionally
            # (odfxml_parser.cpp onODFObject)
            self.suppress_text = True
            self.walk_children(el)
            self.suppress_text = False
            return
        href = _attr(el, "href") or ""
        if not href:
            return
        path = (href[2:] if href.startswith("./") else href) + "/content.xml"
        try:
            root = ET.fromstring(self.zf.read(path))
        except (KeyError, ET.ParseError):
            return
        self.scan_list_styles(root)
        for sub in root.iter():
            if _local(sub.tag) == "body":
                self.walk_children(sub)
                break

    def _emit_text(self, s: str | None) -> None:
        # all-whitespace nodes are suppressed (XML pretty-printing
        # artifacts; reference onODFOOXMLText space_preserve rule,
        # common_xml_document_parser.cpp:217) — real spaces travel as
        # text:s elements
        if s and not self.suppress_text and not s.isspace():
            self.events.append((E.TEXT, s))

    def _inline(self, el) -> None:
        """Inside a paragraph: text nodes, spans, links, spaces."""
        ev = self.events
        self._emit_text(el.text)
        for child in el:
            name = _local(child.tag)
            if name == "s":
                try:
                    n = int(_attr(child, "c") or 1)
                except ValueError:
                    n = 1
                ev.append((E.TEXT, " " * n))
            elif name == "tab":
                ev.append((E.TEXT, "\t"))
            elif name == "line-break":
                ev.append((E.BREAK_LINE, None))
            elif name == "a":
                url = _attr(child, "href") or ""
                ev.append((E.LINK, (url, None)))
                self._inline(child)
                ev.append((E.CLOSE_LINK, None))
            elif name == "annotation":
                self.annotation(child)
            elif name == "object":
                self.object(child)
            elif name == "binary-data":
                pass
            elif name in ("list", "table"):
                self.walk(child)
            else:
                self._inline(child)
            self._emit_text(child.tail)


def _metadata(zf: zipfile.ZipFile) -> dict:
    try:
        root = ET.fromstring(zf.read("meta.xml"))
    except (KeyError, ET.ParseError):
        return {}
    return _meta_from_element(root)


def _meta_from_element(root) -> dict:
    meta: dict = {}
    for el in root.iter():
        name = _local(el.tag)
        text = el.text
        if name == "initial-creator" and text:
            meta["author"] = text
        elif name == "creator" and text:
            meta["last_modified_by"] = text
        elif name == "creation-date" and text:
            dt = parse_iso8601(text)
            if dt:
                meta["creation_date"] = dt
        elif name == "date" and text:
            dt = parse_iso8601(text)
            if dt:
                meta["last_modification_date"] = dt
        elif name == "document-statistic":
            pc = _attr(el, "page-count")
            wc = _attr(el, "word-count")
            try:
                if pc is not None:
                    meta["page_count"] = int(pc)
                if wc is not None:
                    meta["word_count"] = int(wc)
            except ValueError:
                pass
    return meta


def _page_count_fallback(zf: zipfile.ZipFile, meta: dict) -> None:
    """ODP/ODG have no page-count statistic: count <draw:page
    occurrences in content.xml (reference odf_ooxml_parser.cpp:
    696-712)."""
    if "page_count" in meta:
        return
    try:
        content = zf.read("content.xml")
    except KeyError:
        return
    if (
        b"<office:presentation" in content
        or b"<office:drawing" in content
    ):
        meta["page_count"] = content.count(b"<draw:page ")


def odf_flat_to_events(data: bytes):
    """Flat ODF (single-file XML, reference odfxml_parser.cpp): the
    walker covers the WHOLE document — structural events from styles/
    master-pages fire (their paragraph eols are part of the goldens)
    but text nodes are suppressed until office:body; embedded objects
    keep text disabled (onODFObject)."""
    root = ET.fromstring(data)
    walker = _Walker()
    walker.scan_list_styles(root)
    walker.suppress_text = True
    meta_el = None
    for el in root.iter():
        if _local(el.tag) == "meta":
            meta_el = el
            break
    events: list = [(E.DOCUMENT, None)]
    walker.walk_children(root)
    events.extend(walker.events)
    events.append((E.CLOSE_DOCUMENT, None))
    meta = _meta_from_element(meta_el) if meta_el is not None else {}
    if "page_count" not in meta and (
        b"<office:presentation" in data or b"<office:drawing" in data
    ):
        meta["page_count"] = data.count(b"<draw:page ")
    return events, meta


def odf_to_events(data: bytes):
    """Returns (events, meta)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    root = ET.fromstring(zf.read("content.xml"))
    walker = _Walker(zf)
    # list styles may live in styles.xml (LibreOffice) or
    # content.xml automatic-styles
    try:
        walker.scan_list_styles(ET.fromstring(zf.read("styles.xml")))
    except (KeyError, ET.ParseError):
        pass
    walker.scan_list_styles(root)
    body = None
    for el in root.iter():
        if _local(el.tag) == "body":
            body = el
            break
    events: list = [(E.DOCUMENT, None)]
    if body is not None:
        walker.walk_children(body)
    events.extend(walker.events)
    events.append((E.CLOSE_DOCUMENT, None))
    meta = _metadata(zf)
    _page_count_fallback(zf, meta)
    return events, meta
