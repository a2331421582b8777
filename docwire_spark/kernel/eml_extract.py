"""EML (message/rfc822) -> document-element event stream.

Reference: src/eml_parser.cpp.  MIME-tree walk (extractPlainText,
eml_parser.cpp:111-246):

- text part that is not a named attachment:
  - transfer-decoded content with all '\\r' bytes removed
    (eml_parser.cpp:120)
  - html/xhtml subtype: re-emitted ``back`` as a text/html data source
    -> full recursive parse through the pipeline (nested document
    events; the plain-text renderer's nested-doc counter ignores the
    inner close_document)
  - other text subtypes: if the part declared a charset, the decoded
    text is emitted directly as one ``document::text`` event
    (eml_parser.cpp:144-148 — newlines embedded); otherwise re-emitted
    back as text/plain (charset detection path)
- any other non-multipart part: ``mail::attachment`` events around a
  recursive parse of the payload (eml_parser.cpp:164-192)
- multipart/alternative: pick ONE branch — html (including
  multipart/related whose first part is html) > non-attachment plain
  text > first part (eml_parser.cpp:194-240)
- other multiparts: walk all parts in order

Metadata (eml_parser.cpp:480-508): author/From, creation_date/Date,
email attrs from/to/subject/reply-to/sender.
"""

from __future__ import annotations

import email
import email.utils
from email.message import Message


def _charset_decode(raw: bytes, charset: str) -> str:
    """iconv-equivalent (reference charset_converter.cpp:67-113 via
    eml_parser convertToUtf8); unknown charsets fall back to latin-1
    (byte-preserving)."""
    try:
        return raw.decode(charset, errors="replace")
    except LookupError:
        return raw.decode("latin-1", errors="replace")


def _content_bytes(part: Message, strip_cr: bool = True) -> bytes:
    """Transfer-decoded payload.  ``strip_cr`` removes '\\r' bytes —
    the reference does this ONLY on text bodies (eml_parser.cpp:120);
    binary attachments keep raw bytes (eml_parser.cpp:166)."""
    payload = part.get_payload(decode=True)
    if payload is None:
        payload = part.get_payload()
        if isinstance(payload, str):
            payload = payload.encode("utf-8", "surrogateescape")
        elif (
            isinstance(payload, list)
            and payload
            and isinstance(payload[0], Message)
        ):
            # message/rfc822 part: the payload IS the inner message
            payload = payload[0].as_bytes()
        else:
            payload = b""
    return payload.replace(b"\r", b"") if strip_cr else payload


def _is_named_attachment(part: Message) -> bool:
    return (
        part.get_content_disposition() == "attachment"
        and bool(part.get_filename())
    )


def _is_body_text(part: Message, subtypes) -> bool:
    if part.get_content_maintype() != "text":
        return False
    if part.get_content_subtype() not in subtypes:
        return False
    if not _content_bytes(part):
        return False
    if _is_named_attachment(part):
        return False
    return True


def _is_html_branch(part: Message) -> bool:
    if _is_body_text(part, ("html", "xhtml")):
        return True
    if (
        part.get_content_maintype() == "multipart"
        and part.get_content_subtype() == "related"
    ):
        parts = part.get_payload()
        if isinstance(parts, list) and parts:
            return _is_body_text(parts[0], ("html", "xhtml"))
    return False


class _EmlWalker:
    """parse_child(data: bytes, mime: str|None) -> list[event]
    re-enters the full pipeline for back-channel payloads (html
    bodies, attachments); it must never raise (unsupported formats
    return [])."""

    def __init__(self, parse_child):
        self.parse_child = parse_child
        self.events = []

    def walk(self, part: Message) -> None:
        from docwire_spark.kernel import events as E

        maintype = part.get_content_maintype()
        subtype = part.get_content_subtype()

        if maintype == "text" and not _is_named_attachment(part):
            raw = _content_bytes(part)
            charset = part.get_content_charset()
            text = _charset_decode(raw, charset) if charset else None
            if subtype in ("html", "xhtml"):
                data = (
                    text.encode("utf-8")
                    if text is not None else raw
                )
                self.events.extend(self.parse_child(data, "text/html"))
            elif text is not None:
                # mailio's content() excludes the final line terminator
                # (verified against tests/third.eml.out: body ends
                # without it; the close_document eol supplies the last
                # newline)
                if text.endswith("\n"):
                    text = text[:-1]
                self.events.append((E.TEXT, text))
            else:
                self.events.extend(self.parse_child(raw, "text/plain"))
        elif maintype != "multipart":
            name = part.get_filename()
            self.events.append((E.ATTACHMENT, name))
            payload = _content_bytes(part, strip_cr=False)
            E.offer_child(name, payload)
            # the declared content-type travels with the back-emission
            # at very_high confidence (eml_parser.cpp:184-186), so the
            # re-entered detector cascade keeps it.  The child sink is
            # cleared around the re-parse: a nested mail's attachments
            # belong to ITS tree node, not this one.
            tok = E.CHILD_SINK.set(None)
            try:
                self.events.extend(
                    self.parse_child(payload, part.get_content_type())
                )
            finally:
                E.CHILD_SINK.reset(tok)
            self.events.append((E.CLOSE_ATTACHMENT, None))

        if maintype == "multipart" and subtype == "alternative":
            parts = part.get_payload()
            parts = parts if isinstance(parts, list) else []
            selected = next(filter(_is_html_branch, parts), None)
            if selected is None:
                selected = next(
                    (p for p in parts if _is_body_text(p, ("plain",))), None
                )
            if selected is None and parts:
                selected = parts[0]
            if selected is not None:
                self.walk(selected)
        elif maintype == "multipart":
            parts = part.get_payload()
            if isinstance(parts, list):
                for p in parts:
                    self.walk(p)


def _metadata(msg: Message) -> dict:
    meta: dict = {}
    frm = msg.get("From")
    if frm:
        meta["author"] = frm
    date = msg.get("Date")
    if date:
        try:
            dt = email.utils.parsedate_to_datetime(date)
            if dt.tzinfo is not None:
                import datetime

                dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            meta["creation_date"] = dt
        except (TypeError, ValueError):
            pass
    email_attrs = {}
    for header, key in (
        ("From", "from"), ("To", "to"), ("Subject", "subject"),
        ("Reply-To", "reply_to"), ("Sender", "sender"),
    ):
        v = msg.get(header)
        if v:
            email_attrs[key] = v
    if "creation_date" in meta:
        email_attrs["date"] = meta["creation_date"]
    if email_attrs:
        meta["email_attrs"] = email_attrs
    return meta


def _unfold_quoted_header_folds(data: bytes) -> bytes:
    """Join header folds that occur INSIDE a quoted parameter value
    with no separator (tests/header_folded_boundary.eml: a boundary
    folded mid-token must reassemble to the delimiter actually used in
    the body; mailio's header parser behaves this way, while RFC 5322
    unfolding would inject a space and break the boundary match).
    Normal folds (outside quotes) keep stdlib semantics."""
    header_end = len(data)
    for sep in (b"\r\n\r\n", b"\n\n"):
        at = data.find(sep)
        if at != -1:
            header_end = min(header_end, at + len(sep))
    head, body = data[:header_end], data[header_end:]
    out = bytearray()
    in_quote = False
    i = 0
    n = len(head)
    while i < n:
        ch = head[i]
        if ch == 0x22:  # '"'
            in_quote = not in_quote
            out.append(ch)
            i += 1
        elif ch in (0x0D, 0x0A) and in_quote:
            # fold inside a quoted string: swallow CRLF + leading WSP
            j = i
            while j < n and head[j] in (0x0D, 0x0A):
                j += 1
            if j < n and head[j] in (0x20, 0x09):
                while j < n and head[j] in (0x20, 0x09):
                    j += 1
                i = j
            else:
                out.append(ch)
                i += 1
        else:
            out.append(ch)
            i += 1
    return bytes(out) + body


def eml_to_events(data: bytes, parse_child):
    """Returns (events, meta).  ``parse_child`` re-enters the pipeline
    for nested payloads (see _EmlWalker)."""
    from docwire_spark.kernel import events as E

    msg = email.message_from_bytes(_unfold_quoted_header_folds(data))
    walker = _EmlWalker(parse_child)
    events = [(E.DOCUMENT, None)]
    walker.walk(msg)
    events.extend(walker.events)
    events.append((E.CLOSE_DOCUMENT, None))
    return events, _metadata(msg)
