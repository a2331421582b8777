"""Event stream -> HTML rendering (reference html_writer.cpp).

Byte rules (html_writer.cpp:95-270, verified against the reference
goldens tests/1..3.html.out.html):

- fixed header ``<!DOCTYPE html>\\n<html>\\n<head>\\n<meta
  charset="utf-8">\\n<title>DocWire</title>\\n`` + metadata ``<meta>``
  lines on the outermost ``document`` event; ``</head>\\n<body>\\n`` is
  emitted lazily before the first non-head event (style/document are
  the only head-content events); ``</body>\\n</html>\\n`` on the
  outermost ``close_document``
- attributes render space-prefixed in ``std::map`` (alphabetical) key
  order; values escaped with the 5-entity table (& " ' < >)
- styling -> ``class`` (space-joined), ``id``, ``style``
- lists always render ``<ul ...>``/``</ul>`` with
  ``list-style-type: <type>`` appended to any inline style; non-basic
  types are double-quoted
- ``<li>`` carries no attributes; text nodes are entity-escaped;
  ``<style>`` content is NOT escaped
"""

from __future__ import annotations

from docwire_spark.kernel import events as E
from docwire_spark.kernel.meta_writer import format_timestamp

_HEADER = (
    b"<!DOCTYPE html>\n"
    b"<html>\n"
    b"<head>\n"
    b'<meta charset="utf-8">\n'
    b"<title>DocWire</title>\n"
)


def _encoded(value: str) -> str:
    return (
        value.replace("&", "&amp;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _styling_attrs(styling) -> dict:
    attrs = {}
    if styling:
        classes, id_, style = styling
        if classes:
            attrs["class"] = " ".join(classes)
        if id_:
            attrs["id"] = id_
        if style:
            attrs["style"] = style
    return attrs


def _tag(name: str, attrs: dict) -> str:
    # std::map iteration = alphabetical key order
    parts = "".join(
        f' {k}="{_encoded(v)}"' for k, v in sorted(attrs.items())
    )
    return f"<{name}{parts}>"


def _meta_block(meta: dict) -> str:
    out = []
    if meta.get("author") is not None:
        out.append(f'<meta name="author" content="{_encoded(str(meta["author"]))}">')
    if meta.get("creation_date") is not None:
        out.append(
            '<meta name="creation-date" content="'
            + format_timestamp(meta["creation_date"]) + '">'
        )
    if meta.get("last_modified_by") is not None:
        out.append(
            '<meta name="last-modified-by" content="'
            + _encoded(str(meta["last_modified_by"])) + '">'
        )
    if meta.get("last_modification_date") is not None:
        out.append(
            '<meta name="last-modification-date" content="'
            + format_timestamp(meta["last_modification_date"]) + '">'
        )
    return "".join(line + "\n" for line in out)


_SIMPLE_OPEN = {
    E.PARAGRAPH: "p",
    E.SECTION: "div",
    E.SPAN: "span",
    E.BOLD: "b",
    E.UNDERLINE: "u",
    E.TABLE: "table",
    E.TABLE_ROW: "tr",
    E.TABLE_CELL: "td",
    E.CAPTION: "caption",
    E.BREAK_LINE: "br",
}

_SIMPLE_CLOSE = {
    E.CLOSE_PARAGRAPH: "</p>",
    E.CLOSE_SECTION: "</div>",
    E.CLOSE_SPAN: "</span>",
    E.CLOSE_BOLD: "</b>",
    E.CLOSE_UNDERLINE: "</u>",
    E.CLOSE_TABLE: "</table>",
    E.CLOSE_TABLE_ROW: "</tr>",
    E.CLOSE_TABLE_CELL: "</td>",
    E.CLOSE_CAPTION: "</caption>",
    E.CLOSE_LINK: "</a>",
    E.CLOSE_LIST: "</ul>",
    E.CLOSE_LIST_ITEM: "</li>",
    E.CLOSE_HEADER: "</header>",
    E.CLOSE_FOOTER: "</footer>",
}

_BASIC_LIST_TYPES = frozenset(("decimal", "disc", "none"))


def render_html(events, meta: dict | None = None) -> bytes:
    """Render the document event stream to the reference's HTML shape."""
    out: list[str] = []
    header_open = False
    nested_docs = 0

    for kind, payload in events:
        if kind == E.DOCUMENT:
            nested_docs += 1
            if nested_docs == 1:
                out.append(_HEADER.decode())
                out.append(_meta_block(meta or {}))
                header_open = True
            continue
        if kind == E.CLOSE_DOCUMENT:
            nested_docs -= 1
            if nested_docs == 0:
                if header_open:
                    out.append("</head>\n<body>\n")
                    header_open = False
                out.append("</body>\n</html>\n")
            continue
        if kind == E.STYLE:
            # style is head content: stays inside the open header
            out.append(f'<style type="text/css">{payload}</style>\n')
            continue
        # any other event closes the head (html_writer.cpp:245-250)
        if header_open:
            out.append("</head>\n<body>\n")
            header_open = False

        if kind == E.TEXT:
            out.append(_encoded(payload))
        elif kind in _SIMPLE_OPEN:
            out.append(_tag(_SIMPLE_OPEN[kind], _styling_attrs(payload)))
        elif kind in _SIMPLE_CLOSE:
            out.append(_SIMPLE_CLOSE[kind])
        elif kind == E.LINK:
            url, styling = payload if isinstance(payload, tuple) else (payload, None)
            attrs = _styling_attrs(styling)
            if url is not None:
                attrs["href"] = url
            out.append(_tag("a", attrs))
        elif kind == E.LIST:
            lt, styling = payload if isinstance(payload, tuple) else (payload, None)
            attrs = _styling_attrs(styling)
            lt = lt or ""
            if lt not in _BASIC_LIST_TYPES:
                lt = f'"{lt}"'
            orig = attrs.get("style")
            attrs["style"] = (
                (orig + "; " if orig else "") + "list-style-type: " + lt
            )
            out.append(_tag("ul", attrs))
        elif kind == E.LIST_ITEM:
            out.append("<li>")
        elif kind == E.IMAGE:
            alt, _ocr, src, styling = (
                payload if payload and len(payload) >= 4
                else (payload[0] if payload else None, None, None, None)
            )
            attrs = _styling_attrs(styling)
            if alt is not None:
                attrs["alt"] = alt
            attrs["src"] = src or ""
            out.append(_tag("img", attrs))
        elif kind == E.HEADER:
            out.append("<header>")
        elif kind == E.FOOTER:
            out.append("<footer>")
        # other kinds (page, mail, comment) have no HTML mapping

    return "".join(out).encode("utf-8", "surrogateescape")
