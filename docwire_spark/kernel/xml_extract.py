"""Generic XML -> text events (reference: src/xml_parser.cpp).

Walks the XML tree in document order emitting raw text nodes (no
whitespace collapsing), skipping <style> (any namespace prefix),
o:DocumentProperties, o:CustomDocumentProperties and w:binData
subtrees; w:p maps to paragraph events and w:tab to a tab character.
The reference reads the raw bytes without charset conversion; we
decode UTF-8 with surrogateescape for byte round-tripping.
"""

from __future__ import annotations

import re

from docwire_spark.kernel import events as E

_TOKEN = re.compile(
    r"<\?.*?\?>|<!--.*?-->|<!\[CDATA\[.*?\]\]>|<![^>]*>|</[^>]+>|<[^>]+>",
    re.S,
)
_ENTITIES = {"&lt;": "<", "&gt;": ">", "&amp;": "&", "&apos;": "'", "&quot;": '"'}
_ENT_RE = re.compile(r"&(?:lt|gt|amp|apos|quot|#\d+|#x[0-9a-fA-F]+);")

_SKIP_FULL_NAMES = frozenset(
    ("o:DocumentProperties", "o:CustomDocumentProperties", "w:binData")
)


def _decode_entities(s: str) -> str:
    def repl(m):
        t = m.group(0)
        if t in _ENTITIES:
            return _ENTITIES[t]
        if t[:3] in ("&#x", "&#X"):
            return chr(int(t[3:-1], 16))
        return chr(int(t[2:-1]))

    return _ENT_RE.sub(repl, s)


def xml_to_events(data: bytes):
    text = data.decode("utf-8", "surrogateescape")
    events = [(E.DOCUMENT, None)]
    skip_depth = 0
    depth = 0  # text outside the root element is not document content
    pos = 0
    for m in _TOKEN.finditer(text):
        if m.start() > pos and skip_depth == 0 and depth > 0:
            chunk = text[pos : m.start()]
            if chunk:
                events.append((E.TEXT, _decode_entities(chunk)))
        pos = m.end()
        tok = m.group(0)
        if tok.startswith("<![CDATA["):
            if skip_depth == 0 and depth > 0 and tok[9:-3]:
                events.append((E.TEXT, tok[9:-3]))
            continue
        if tok.startswith("<?") or tok.startswith("<!"):
            continue
        if tok.startswith("</"):
            name = tok[2:-1].strip()
            if skip_depth > 0:
                skip_depth -= 1
                continue
            depth -= 1
            if name == "w:p":
                events.append((E.CLOSE_PARAGRAPH, None))
            continue
        inner = tok[1:-1].strip()
        self_closing = inner.endswith("/")
        if self_closing:
            inner = inner[:-1].strip()
        name = inner.split()[0] if inner else ""
        if skip_depth > 0:
            if not self_closing:
                skip_depth += 1
            continue
        local = name.rsplit(":", 1)[-1]
        if local == "style" or name in _SKIP_FULL_NAMES:
            if not self_closing:
                skip_depth = 1
            continue
        if not self_closing:
            depth += 1
        if name == "w:p":
            events.append((E.PARAGRAPH, None))
            if self_closing:
                events.append((E.CLOSE_PARAGRAPH, None))
        elif name == "w:tab":
            events.append((E.TEXT, "\t"))
    if pos < len(text) and skip_depth == 0 and depth > 0:
        tail = text[pos:]
        if tail:
            events.append((E.TEXT, _decode_entities(tail)))
    events.append((E.CLOSE_DOCUMENT, None))
    return events
