"""Plain-text parser (reference: src/txt_parser.cpp).

- charset detection (BOM / charset_normalizer; reference uses
  universalchardet) -> convert to UTF-8; on detect-fail: assume ASCII
  and keep only printable sequences (min run 4, '\\n' delimiter,
  reference txt_parser.cpp:44-76)
- default mode parse_paragraphs=True, parse_lines=True: paragraphs
  split on empty lines; lines inside a paragraph joined by break_line
  events (reference txt_parser.cpp:189-251 + txt_parser.h:29-30)
"""

from __future__ import annotations

from docwire_spark.kernel import events as E
from docwire_spark.kernel.charset import guess_encoding, resolve_codec


def sequences_of_printable_characters(text: str, min_seq_len: int = 4, seq_delim: str = "\n") -> str:
    out = []
    field = []
    printable_count = 0
    non_printable_count = 0
    for ch in text:
        # std::isprint on bytes: ASCII 0x20..0x7E
        o = ord(ch)
        if 0x20 <= o <= 0x7E:
            field.append(ch)
            printable_count += 1
            non_printable_count = 0
        else:
            if printable_count >= min_seq_len:
                out.extend(field)
                if non_printable_count == 0:
                    out.append(seq_delim)
            field = []
            printable_count = 0
            non_printable_count += 1
    out.extend(field)
    return "".join(out)


def decode_txt(data: bytes) -> str:
    encoding = guess_encoding(data)
    if encoding is None:
        # detector failed: ASCII fallback + printable-sequence filter
        content = data.decode("latin-1")
        return sequences_of_printable_characters(content)
    codec = resolve_codec(encoding)
    if codec is None or codec in ("utf-8", "utf8", "ascii"):
        return data.decode("utf-8", "surrogateescape")
    try:
        return data.decode(codec, "strict")
    except UnicodeDecodeError:
        return data.decode("utf-8", "surrogateescape")


def txt_to_events(data: bytes, parse_paragraphs: bool = True, parse_lines: bool = True):
    text = decode_txt(data)
    events = [(E.DOCUMENT, None)]
    if parse_lines or parse_paragraphs:
        curr = 0
        n = len(text)
        OUTSIDE, EMPTY, FILLED = 0, 1, 2
        state = OUTSIDE
        last_eol = ""
        while True:
            eol_pos = -1
            for idx in range(curr, n):
                if text[idx] in "\r\n":
                    eol_pos = idx
                    break
            if eol_pos == -1:
                eol = ""
                line = text[curr:]
            else:
                eol = text[eol_pos]
                if eol == "\r" and eol_pos + 1 < n and text[eol_pos + 1] == "\n":
                    eol += "\n"
                line = text[curr:eol_pos]
            if parse_paragraphs:
                if state == OUTSIDE:
                    events.append((E.PARAGRAPH, None))
                    state = EMPTY
                if not line:
                    events.append((E.CLOSE_PARAGRAPH, None))
                    state = OUTSIDE
                else:
                    if state == FILLED:
                        if parse_lines:
                            events.append((E.BREAK_LINE, None))
                        else:
                            events.append((E.TEXT, last_eol))
                    events.append((E.TEXT, line))
                    state = FILLED
            else:
                if line:
                    events.append((E.TEXT, line))
                if eol:
                    if parse_lines:
                        events.append((E.BREAK_LINE, None))
                    else:
                        events.append((E.TEXT, eol))
            if not eol:
                break
            curr = eol_pos + len(eol)
            last_eol = eol
        if parse_paragraphs and state != OUTSIDE:
            events.append((E.CLOSE_PARAGRAPH, None))
    else:
        events.append((E.TEXT, text))
    events.append((E.CLOSE_DOCUMENT, None))
    return events
