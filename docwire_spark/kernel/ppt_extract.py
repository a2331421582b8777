"""Minimal binary PPT -> document-element event stream.

Reference: src/ppt_parser.cpp — walk 8-byte record headers through the
"PowerPoint Document" stream; TextCharsAtom/CString are UTF-16LE,
TextBytesAtom bytes map directly to U+00XX codepoints (latin-1), 0x0B/
0x0D become newlines, every text atom appends one newline; container
records descend implicitly, MAIN_MASTER and unknown records skip their
payload.  Output is one text event in a document wrapper (like XLS).
"""

from __future__ import annotations

import struct

from docwire_spark.kernel import events as E
from docwire_spark.kernel.cfb import CfbFile
from docwire_spark.kernel.doc_extract import _summary_metadata

_RT_CSTRING = 0x0FBA
_RT_TEXT_CHARS = 0x0FA0
_RT_TEXT_BYTES = 0x0FA8
_RT_MAIN_MASTER = 0x03F8
_RT_END_DOCUMENT = 0x03EA

# containers the walker descends into (payload parsed as records)
_CONTAINERS = frozenset(
    (
        0x03E8,  # Document
        0x040C,  # Drawing
        0x07D0,  # List
        0x03EC,  # SlideBase
        0x0FF0,  # SlideListWithText
        0x03EE,  # Slide
        0xF00D, 0xF002, 0xF003, 0xF004,  # OfficeArt containers
    )
)


def _parse_ppt_stream(data: bytes) -> str:
    text: list[str] = []
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        rec_type = struct.unpack_from("<H", data, pos + 2)[0]
        rec_len = struct.unpack_from("<I", data, pos + 4)[0]
        pos += 8
        if rec_type in (_RT_CSTRING, _RT_TEXT_CHARS):
            count = min(rec_len // 2, (n - pos) // 2)
            i = 0
            while i < count:
                (u,) = struct.unpack_from("<H", data, pos + 2 * i)
                i += 1
                if u in (0x0B, 0x0D):
                    text.append("\n")
                    continue
                if 0xD800 <= u < 0xDC00 and i < count:
                    (lo,) = struct.unpack_from("<H", data, pos + 2 * i)
                    i += 1
                    u = 0x10000 + ((u - 0xD800) << 10) + (lo - 0xDC00)
                text.append(chr(u))
            pos += 2 * count
            text.append("\n")
        elif rec_type == _RT_TEXT_BYTES:
            count = min(rec_len, n - pos)
            for b in data[pos : pos + count]:
                text.append("\n" if b in (0x0B, 0x0D) else chr(b))
            pos += count
            text.append("\n")
        elif rec_type in _CONTAINERS:
            pass  # descend: children are parsed by the same loop
        else:  # atoms (incl. MAIN_MASTER, END_DOCUMENT): skip payload
            pos += min(rec_len, n - pos)
    return "".join(text)


def ppt_to_events(data: bytes):
    """Returns (events, meta)."""
    cfb = CfbFile(data)
    names = set(cfb.stream_names())
    if "EncryptedSummary" in names:
        raise ValueError("file is encrypted")
    stream = cfb.read_stream("PowerPoint Document")
    text = _parse_ppt_stream(stream)
    events = [
        (E.DOCUMENT, None),
        (E.TEXT, text),
        (E.CLOSE_DOCUMENT, None),
    ]
    return events, _summary_metadata(cfb)
