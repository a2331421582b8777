"""Minimal RTF -> document-element event stream.

Covers the text-extraction core of the reference's rtf_parser
(reference: src/rtf_parser.cpp, 838 LoC control-word machine; this is
the subset needed for plain-text parity on simple documents):

- group nesting with skipped destinations (fonttbl/colortbl/
  stylesheet/info/pict/\\* groups)
- control words with optional numeric args; \\par and \\line ->
  break_line; \\tab -> tab character
- \\'hh codepage escapes (codepage from \\ansicpgN, default 1252),
  \\uN unicode escapes with \\ucN skip counts, \\{ \\} \\\\ literals
- {\\field{\\*\\fldinst HYPERLINK "url"}{\\fldrslt text}} -> link
  events (renders as ``<url>text``)

Tables (\\trowd/\\cell/\\row) and list numbering are NOT implemented —
documents using them fall outside this parser's parity gate.
"""

from __future__ import annotations

import re

import datetime

from docwire_spark.kernel import events as E
from docwire_spark.kernel.meta_writer import format_timestamp


def _parse_dttm(dttm: int):
    """RTF DTTM packed date (reference rtf_parser.cpp:304-321)."""
    minute = dttm & 0x3F
    dttm >>= 6
    hour = dttm & 0x1F
    dttm >>= 5
    day = dttm & 0x1F
    dttm >>= 5
    mon = dttm & 0x0F
    dttm >>= 4
    year = 1900 + (dttm & 0x1FF)
    try:
        return datetime.datetime(year, mon, day, hour, minute)
    except ValueError:
        return None


_CW = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?")
_SKIP_DESTINATIONS = frozenset(
    (
        b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
        b"themedata", b"colorschememapping", b"datastore", b"latentstyles",
        b"listtable", b"listoverridetable", b"rsidtbl", b"generator",
        b"header", b"footer", b"xmlnstbl",
    )
)
_HYPERLINK = re.compile(r'HYPERLINK\s+"?([^"\s]+)"?')


# \fcharsetN -> codepage (RTF spec charset table)
_CHARSET_CODEPAGE = {
    0: "cp1252", 128: "cp932", 129: "cp949", 134: "cp936", 136: "cp950",
    161: "cp1253", 162: "cp1254", 163: "cp1258", 177: "cp1255",
    178: "cp1256", 186: "cp1257", 204: "cp1251", 222: "cp874",
    238: "cp1250",
}


class _Rtf:
    def __init__(self, data: bytes):
        self.data = data
        self.codepage = "cp1252"
        self.default_codepage = "cp1252"
        self.font_codepages: dict[int, str] = {}
        self.events: list = []
        self.text: list[str] = []
        self.uc_skip = 1
        self.atn_author = ""
        self.atn_time = None
        self.collector: list[str] | None = None  # annotation text sink

    def _scan_fonttbl(self, body: bytes):
        """Collect font -> codepage from {\\fonttbl ...}: WordPad-style
        mixed-encoding files switch the \\'hh codepage per \\fN
        (reference rtf parser does the same via its charset table)."""
        for m in re.finditer(rb"\\f(\d+)[^;}]*?\\fcharset(\d+)", body):
            cp = _CHARSET_CODEPAGE.get(int(m.group(2)))
            if cp:
                self.font_codepages[int(m.group(1))] = cp

    def flush(self):
        if self.text:
            self.events.append((E.TEXT, "".join(self.text)))
            self.text = []

    def _append(self, s: str):
        (self.collector if self.collector is not None else self.text).append(s)

    def _break_line(self):
        if self.collector is not None:
            self.collector.append("\n")
        else:
            self.flush()
            self.events.append((E.BREAK_LINE, None))

    def parse(self):
        self.events.append((E.DOCUMENT, None))
        # parse exactly the root group; bytes after its closing brace
        # (stray NULs, trailing whitespace) are not document content
        start = self.data.find(b"{")
        if start != -1:
            end = self._group_end(start, len(self.data))
            self._group(start + 1, end - 1, skip=False)
        self.flush()
        self.events.append((E.CLOSE_DOCUMENT, None))
        return self.events

    def _group_end(self, i: int, end: int) -> int:
        """Index just past the matching '}' for the group opened at
        data[i] == '{'."""
        depth = 0
        while i < end:
            c = self.data[i]
            if c == 0x5C:  # backslash: skip escaped char
                i += 2
                continue
            if c == 0x7B:
                depth += 1
            elif c == 0x7D:
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        return end

    def _field(self, i: int, end: int):
        """Handle a {\\field ...} group: link events."""
        body = self.data[i:end]
        m = re.search(rb"{\\\*\\fldinst[^{}]*({[^{}]*})*", body)
        inst = b""
        fm = re.search(rb"\\fldinst", body)
        if fm:
            # fldinst group runs to its matching brace
            gstart = body.rfind(b"{", 0, fm.start())
            gend_rel = self._group_end_rel(body, gstart)
            inst = body[gstart:gend_rel]
        url = None
        um = _HYPERLINK.search(inst.decode("latin-1"))
        if um:
            url = um.group(1)
        rm = re.search(rb"\\fldrslt", body)
        self.flush()
        if url is not None:
            self.events.append((E.LINK, (url, None)))
        if rm:
            gstart = body.rfind(b"{", 0, rm.start())
            gend_rel = self._group_end_rel(body, gstart)
            self._group(i + rm.end(), i + gend_rel - 1, skip=False)
            self.flush()
        if url is not None:
            self.events.append((E.CLOSE_LINK, None))

    def _group_end_rel(self, buf: bytes, start: int) -> int:
        depth = 0
        i = start
        while i < len(buf):
            c = buf[i]
            if c == 0x5C:
                i += 2
                continue
            if c == 0x7B:
                depth += 1
            elif c == 0x7D:
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        return len(buf)

    def _group(self, i: int, end: int, skip: bool):
        data = self.data
        while i < end:
            c = data[i]
            if c == 0x7B:  # '{'
                gend = self._group_end(i, end)
                # peek destination
                m = _CW.match(data, i + 1)
                starred = data[i + 1 : i + 3] == b"\\*"
                if starred:
                    m2 = _CW.match(data, i + 3)
                    name = m2.group(1) if m2 else b""
                    if name == b"atndate":
                        dm = re.search(rb"(\d+)", data[i:gend])
                        if dm:
                            self.atn_time = _parse_dttm(int(dm.group(1)))
                    elif name == b"atnauthor":
                        raw = data[m2.end():gend - 1]
                        self.atn_author = raw.decode(
                            self.codepage, "replace"
                        ).strip()
                    elif name == b"annotation":
                        # collect the annotation body as plain text,
                        # then emit one comment event (reference
                        # rtf_parser.cpp:633-634)
                        prev, self.collector = self.collector, []
                        self._group(m2.end(), gend - 1, skip=False)
                        comment = "".join(self.collector)
                        self.collector = prev
                        self.flush()
                        t = (
                            format_timestamp(self.atn_time)
                            if self.atn_time else None
                        )
                        self.events.append(
                            (E.COMMENT, (self.atn_author, t, comment))
                        )
                    i = gend  # other \* destinations: skip
                    continue
                name = m.group(1) if m else b""
                if name == b"field":
                    self._field(i + 1, gend - 1)
                elif name == b"fonttbl":
                    self._scan_fonttbl(data[i:gend])
                elif name == b"atndate":
                    dm = re.search(rb"(\d+)", data[i:gend])
                    if dm:
                        self.atn_time = _parse_dttm(int(dm.group(1)))
                elif name in _SKIP_DESTINATIONS:
                    pass  # skip whole group
                else:
                    self._group(i + 1, gend - 1, skip)
                i = gend
            elif c == 0x7D:
                i += 1
            elif c == 0x5C:  # '\'
                nxt = data[i + 1 : i + 2]
                if nxt == b"'":
                    try:
                        ch = bytes([int(data[i + 2 : i + 4], 16)]).decode(
                            self.codepage, "replace"
                        )
                        if not skip:
                            self._append(ch)
                    except ValueError:
                        pass
                    i += 4
                elif nxt in (b"\\", b"{", b"}"):
                    if not skip:
                        self._append(nxt.decode())
                    i += 2
                elif nxt == b"~":
                    if not skip:
                        self._append("\u00a0")
                    i += 2
                elif nxt in (b"\r", b"\n"):
                    # escaped newline == \par (RTF spec)
                    if not skip:
                        self._break_line()
                    i += 2
                    if nxt == b"\r" and data[i : i + 1] == b"\n":
                        i += 1
                else:
                    m = _CW.match(data, i)
                    if not m:
                        i += 2
                        continue
                    word, arg = m.group(1), m.group(2)
                    i = m.end()
                    if skip:
                        continue
                    if word in (b"par", b"line", b"cell"):
                        # \cell renders as its own line (verified
                        # tests/2.rtf.out: no grid layout in the
                        # reference's RTF path, unlike its XLS path)
                        self._break_line()
                    elif word == b"tab":
                        self._append("\t")
                    elif word == b"ansicpg" and arg:
                        try:
                            "".encode().decode(f"cp{int(arg)}")
                            self.codepage = f"cp{int(arg)}"
                            self.default_codepage = self.codepage
                        except (LookupError, ValueError):
                            pass
                    elif word == b"f" and arg:
                        try:
                            self.codepage = self.font_codepages.get(
                                int(arg), self.default_codepage
                            )
                        except ValueError:
                            pass
                    elif word == b"uc" and arg:
                        try:
                            self.uc_skip = int(arg)
                        except ValueError:
                            pass
                    elif word == b"u" and arg:
                        try:
                            n = int(arg)
                            self._append(chr(n + 65536 if n < 0 else n))
                        except ValueError:
                            pass
                        # skip the fallback chars
                        j = i
                        for _ in range(self.uc_skip):
                            if data[j : j + 2].startswith(b"\\'"):
                                j += 4
                            elif j < end and data[j] not in (0x5C, 0x7B, 0x7D):
                                j += 1
                        i = j
            elif c in (0x0D, 0x0A):
                # raw newlines are ignored EXCEPT inside annotations
                # (reference rtf_parser.cpp:680: ch != '\n' ||
                # destination == annotation; '\r' always dropped)
                if c == 0x0A and self.collector is not None and not skip:
                    self.collector.append("\n")
                i += 1
            else:
                if not skip:
                    self._append(chr(c) if c < 128 else bytes([c]).decode(self.codepage, "replace"))
                i += 1


def _grab_until(content: bytes, marker: bytes, stop: bytes) -> str | None:
    p = content.find(marker)
    if p == -1:
        return None
    out = bytearray()
    for i in range(p + len(marker), len(content)):
        if content[i : i + 1] in stop:
            break
        out.append(content[i])
    return out.decode("latin-1")


def _rtf_metadata(data: bytes) -> dict:
    """Whole-content scans, as the reference does
    (rtf_parser.cpp:749-803: find \\author / \\operator / \\creatim /
    \\revtim / \\nofpages / \\nofwords)."""
    meta: dict = {}
    v = _grab_until(data, b"\\author ", (b"{", b"}"))
    if v is not None:
        meta["author"] = v
    v = _grab_until(data, b"\\operator ", (b"{", b"}"))
    if v is not None:
        meta["last_modified_by"] = v

    def rtf_time(s: str):
        def comp(name, default):
            m = re.search(rf"\\{name}(\d+)", s)
            return int(m.group(1)) if m else default

        try:
            return datetime.datetime(
                comp("yr", 0), comp("mo", 1), comp("dy", 1),
                comp("hr", 0), comp("min", 0), comp("sec", 0),
            )
        except ValueError:
            return None

    v = _grab_until(data, b"\\creatim", (b"}",))
    if v is not None:
        dt = rtf_time(v)
        if dt:
            meta["creation_date"] = dt
    v = _grab_until(data, b"\\revtim", (b"}",))
    if v is not None:
        dt = rtf_time(v)
        if dt:
            meta["last_modification_date"] = dt
    for marker, key in ((b"\\nofpages", "page_count"),
                        (b"\\nofwords", "word_count")):
        v = _grab_until(data, marker, (b"}",))
        if v is not None:
            try:
                meta[key] = int(v.strip())
            except ValueError:
                pass
    return meta


def rtf_to_events(data: bytes):
    """Returns (events, meta)."""
    return _Rtf(data).parse(), _rtf_metadata(data)
