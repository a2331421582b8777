"""HTML DOM -> document-element event stream.

Replicates the reference's DOM walk and whitespace state machine
(reference: src/html_parser.cpp:406-871) byte-for-byte:

- per text node: ASCII ``\\s+`` -> single space (U+00A0 and all other
  non-ASCII whitespace survive; the C++ std::regex there is ASCII-only
  on bytes, verified by tests/html_parser_tests.cpp U+00A0 case)
- trim-left when the previous char in the inline formatting context is
  an ASCII space or the context is empty
- text is buffered and flushed at every tag; block-level/table tags
  right-trim the buffer and reset the context
- head text suppressed except <style>; <title>/<script>/<iframe>
  content suppressed; CSS ``list-style: none`` on ol/ul/li disables
  list enumeration (the LibreOffice export quirk)
"""

from __future__ import annotations

import re

from docwire_spark.kernel import events as E
from docwire_spark.kernel.dates import parse_iso8601_or_legacy
from docwire_spark.kernel.dom import ELEMENT, TEXT, Node, parse_html

_ASCII_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")
_ASCII_WS = " \t\n\r\f\v"

BLOCK_LEVEL = frozenset(
    "address article aside blockquote details dialog dd div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header "
    "hgroup hr li main nav ol p pre section table ul html body".split()
)
TABLE_ELEMENTS = frozenset("td tr th caption thead tbody tfoot".split())
PARAGRAPH_ELEMENTS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6", "p"))


def parse_css_list_style(style_text: str):
    """Scan CSS for ``<sel> { list-style: none }`` on li/ul/ol
    (reference html_parser.cpp:406-464, same scanning logic)."""
    turn_off_ul = turn_off_ol = False
    search = 0
    while True:
        found = style_text.find("list-style:", search)
        if found == -1:
            break
        search = found + 11
        style_name = []
        i = found + 11
        while i < len(style_text):
            ch = style_text[i]
            if ch == ";":
                break
            if not ch.isspace():
                style_name.append(ch)
            i += 1
            search += 1
        if "".join(style_name) == "none":
            match_index = 0
            for i in range(found, 0, -1):
                if style_text[i] == "{":
                    match_index = i - 1
                    break
            match = ""
            while match_index >= 0:
                ch = style_text[match_index]
                if ch.isspace():
                    if match:
                        break
                else:
                    match = ch + match
                match_index -= 1
            if match == "li":
                turn_off_ol = turn_off_ul = True
            elif match == "ul":
                turn_off_ul = True
            elif match == "ol":
                turn_off_ol = True
    return turn_off_ul, turn_off_ol


class _Ctx:
    __slots__ = (
        "events", "turn_off_ul", "turn_off_ol", "in_head", "in_title",
        "in_script", "in_style", "style_text", "buffered_text",
        "last_char", "in_metadata", "meta",
    )

    def __init__(self):
        self.events = []
        self.turn_off_ul = False
        self.turn_off_ol = False
        self.in_head = False
        self.in_title = False
        self.in_script = False
        self.in_style = False
        self.style_text = []
        self.buffered_text = ""
        self.last_char = "\0"
        self.in_metadata = False
        self.meta = {}


def decode_data_url(src):
    """Decode a base64 ``data:`` URL into (mime, bytes), or None.

    Reference semantics (src/html_parser.cpp:354-377
    ``create_image_source``): require a comma, require ';base64' in
    the pre-comma metadata, reject empty payloads; the mime is the
    metadata up to the first ';' with an octet-stream default.  The
    reference throws on malformed URLs and the caller degrades to the
    alt text — returning None models the same recovery."""
    if not src or not src.startswith("data:"):
        return None
    comma = src.find(",")
    if comma < 0:
        return None
    meta = src[5:comma]
    if ";base64" not in meta:
        return None
    import base64

    try:
        data = base64.b64decode(src[comma + 1:])
    except (ValueError, TypeError):
        return None
    if not data:
        return None
    semi = meta.find(";")
    mime = meta[:semi] if semi > 0 else "application/octet-stream"
    return (mime or "application/octet-stream", data)


def _emit(ctx, kind, payload=None):
    ctx.events.append((kind, payload))


def _styling(node):
    """Capture (classes, id, style) from the element's attributes
    (reference html_parser.cpp:50-71: class split on single spaces,
    style whitespace-trimmed).  None when all empty — the common case,
    keeping event tuples cheap inside Arrow batches."""
    attrs = node.attrs
    class_str = attrs.get("class")
    classes = class_str.split(" ") if class_str else []
    id_ = attrs.get("id") or ""
    style = (attrs.get("style") or "").strip()
    if not classes and not id_ and not style:
        return None
    return (classes, id_, style)


def _process_text(ctx, text):
    if ctx.in_head and not ctx.in_style:
        return
    if ctx.in_style:
        ctx.style_text.append(text)
        return
    text = _ASCII_WS_RUN.sub(" ", text)
    last_was_space = ctx.last_char in _ASCII_WS
    if last_was_space or ctx.last_char == "\0":
        text = text.lstrip(_ASCII_WS)
    if text:
        ctx.last_char = text[-1]
        ctx.buffered_text += text


def _flush_buffer(ctx, tag_name):
    if not ctx.buffered_text:
        return
    if tag_name in BLOCK_LEVEL or tag_name in TABLE_ELEMENTS:
        ctx.buffered_text = ctx.buffered_text.rstrip(_ASCII_WS)
        ctx.last_char = "\0"
    if ctx.buffered_text:
        _emit(ctx, E.TEXT, ctx.buffered_text)
        ctx.buffered_text = ""


def _handle_meta(ctx, attrs):
    name = attrs.get("name")
    content = attrs.get("content")
    if not name or content is None:
        return
    lname = name.lower()
    if lname in ("author", "dcterms.creator"):
        ctx.meta["author"] = content
    elif lname in ("changedby", "dcterms.contributor"):
        ctx.meta.setdefault("last_modified_by", content)
    elif lname in ("created", "dcterms.issued"):
        dt = parse_iso8601_or_legacy(content)
        if dt is not None:
            ctx.meta["creation_date"] = dt
    elif lname in ("changed", "dcterms.modified"):
        if "last_modification_date" not in ctx.meta:
            dt = parse_iso8601_or_legacy(content)
            if dt is not None:
                ctx.meta["last_modification_date"] = dt


def _process_tag(ctx, node, closing):
    name = node.name
    _flush_buffer(ctx, name)
    if closing:
        if name == "style":
            ctx.in_style = False
            if not ctx.in_metadata:
                _emit(ctx, E.STYLE, "".join(ctx.style_text))
            ctx.style_text = []
        elif name in PARAGRAPH_ELEMENTS:
            _emit(ctx, E.CLOSE_PARAGRAPH)
        elif name == "div":
            _emit(ctx, E.CLOSE_SECTION)
        elif name == "span":
            _emit(ctx, E.CLOSE_SPAN)
        elif name == "a":
            _emit(ctx, E.CLOSE_LINK)
        elif name == "table":
            _emit(ctx, E.CLOSE_TABLE)
        elif name == "caption":
            _emit(ctx, E.CLOSE_CAPTION)
        elif name == "tr":
            _emit(ctx, E.CLOSE_TABLE_ROW)
        elif name in ("td", "th"):
            _emit(ctx, E.CLOSE_TABLE_CELL)
        elif name == "title":
            ctx.in_title = False
        elif name in ("script", "iframe") and ctx.in_script:
            ctx.in_script = False
        elif name in ("ul", "ol"):
            _emit(ctx, E.CLOSE_LIST)
        elif name == "li":
            _emit(ctx, E.CLOSE_LIST_ITEM)
        elif name == "b":
            _emit(ctx, E.CLOSE_BOLD)
        elif name == "u":
            _emit(ctx, E.CLOSE_UNDERLINE)
        return
    if name == "style":
        ctx.in_style = True
    elif name in PARAGRAPH_ELEMENTS:
        _emit(ctx, E.PARAGRAPH, _styling(node))
    elif name == "div":
        _emit(ctx, E.SECTION, _styling(node))
    elif name == "span":
        _emit(ctx, E.SPAN, _styling(node))
    elif name == "a":
        url = node.attrs.get("href")
        if url is not None:
            if url[:1] == "#" or url.startswith("javascript"):
                url = ""
        else:
            url = ""
        _emit(ctx, E.LINK, (url, _styling(node)))
    elif name == "img":
        src = node.attrs.get("src")
        ocr_text = None
        decoded = decode_data_url(src)
        if decoded is not None:
            from docwire_spark.kernel.ocr import ocr_image

            ocr_text = ocr_image(decoded[1])
        _emit(
            ctx, E.IMAGE,
            (node.attrs.get("alt"), ocr_text, src, _styling(node)),
        )
    elif name == "table":
        _emit(ctx, E.TABLE, _styling(node))
    elif name == "caption":
        _emit(ctx, E.CAPTION, _styling(node))
    elif name == "tr":
        _emit(ctx, E.TABLE_ROW, _styling(node))
    elif name in ("td", "th"):
        _emit(ctx, E.TABLE_CELL, _styling(node))
    elif name in ("ul", "ol"):
        style_type_none = False
        style_attr = node.attrs.get("style")
        if style_attr is not None:
            if "list-style: none" in style_attr:
                style_type_none = True
        elif name == "ol" and ctx.turn_off_ol:
            style_type_none = True
        elif name == "ul" and ctx.turn_off_ul:
            style_type_none = True
        list_type = "none" if style_type_none else ("decimal" if name == "ol" else "disc")
        _emit(ctx, E.LIST, (list_type, _styling(node)))
    elif name == "br":
        ctx.last_char = "\0"
        _emit(ctx, E.BREAK_LINE, _styling(node))
    elif name == "li":
        _emit(ctx, E.LIST_ITEM, _styling(node))
    elif name == "title":
        ctx.in_title = True
    elif name in ("script", "iframe"):
        ctx.in_script = True
    elif name == "b":
        _emit(ctx, E.BOLD, _styling(node))
    elif name == "u":
        _emit(ctx, E.UNDERLINE, _styling(node))
    elif name == "meta":
        _handle_meta(ctx, node.attrs)


def _process_node(ctx, node):
    """Iterative DOM walk (explicit stack): crawl pages nest
    thousands of elements deep, far past Python's recursion limit —
    the reference's lexbor walk is iterative too."""
    if node is None:
        return
    stack = [(node, False)]
    while stack:
        cur, closing = stack.pop()
        if closing:
            _process_tag(ctx, cur, True)
            continue
        if cur.type == ELEMENT:
            _process_tag(ctx, cur, False)
            stack.append((cur, True))
        elif cur.type == TEXT:
            if not (ctx.in_metadata or ctx.in_title or ctx.in_script):
                _process_text(ctx, cur.text)
        for child in reversed(cur.children):
            stack.append((child, False))


def html_to_events(text: str):
    """Parse HTML (already UTF-8 text) and return (events, meta dict).

    Event stream mirrors reference html_parser::parse:
    document ... close_document.
    """
    root = parse_html(text)
    head = root.find("head")
    body = root.find("body")

    ctx = _Ctx()
    if head is not None:
        head_text = head.text_content()
        if head_text:
            ctx.turn_off_ul, ctx.turn_off_ol = parse_css_list_style(head_text)

    _emit(ctx, E.DOCUMENT)
    if head is not None:
        ctx.in_head = True
        _process_node(ctx, head)
        ctx.in_head = False
    if body is not None:
        _process_node(ctx, body)
    _emit(ctx, E.CLOSE_DOCUMENT)
    return ctx.events, ctx.meta
