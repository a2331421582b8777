"""Minimal XLSB (BIFF12) -> document-element event stream.

Reference: src/xlsb_parser.cpp — ZIP container with variable-length-
framed binary records (7-bit type/size encoding):

- xl/sharedStrings.bin: BrtBeginSst + BrtSSTItem rich strings
- xl/worksheets/sheetN.bin in numeric order, "\\n\\n" after EVERY
  sheet; BrtRowHdr emits row newlines, cells tab-separate via the
  column-gap rule (xlsb_parser.cpp parseColumn), CELL_ISST/ST/RK/
  REAL/BOOL/ERROR/BLANK + formula variants
- numbers format like C++ default ostream (%g, 6 significant digits);
  integer RKs as plain ints
- page count from docProps/app.xml TitlesOfParts vector size,
  metadata from docProps/core.xml

Output = one text event in a document wrapper.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile

from docwire_spark.kernel import events as E
from docwire_spark.kernel.xlsx_extract import _metadata as _core_metadata

_ERROR_CODES = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A", 0x2B: "#GETTING_DATA",
}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def done(self) -> bool:
        return self.pos >= len(self.data)

    def record(self):
        """(type, payload) with 7-bit varint type (max 2 bytes) and
        size (max 4 bytes)."""
        t = 0
        for i in range(2):
            b = self.data[self.pos]
            self.pos += 1
            t += (b & 0x7F) << (i * 7)
            if b < 128:
                break
        size = 0
        for i in range(4):
            b = self.data[self.pos]
            self.pos += 1
            size += (b & 0x7F) << (i * 7)
            if b < 128:
                break
        payload = self.data[self.pos : self.pos + size]
        self.pos += size
        return t, payload


def _wide_str(payload: bytes, off: int) -> tuple[str, int]:
    (n,) = struct.unpack_from("<I", payload, off)
    off += 4
    s = payload[off : off + 2 * n].decode("utf-16-le", "replace")
    return s, off + 2 * n


def _fmt_g(v: float) -> str:
    return f"{v:g}"


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.bin")
    except KeyError:
        return []
    out = []
    r = _Reader(data)
    while not r.done():
        t, payload = r.record()
        if t == 0x13:  # BrtSSTItem: flags byte + wide string
            s, _ = _wide_str(payload, 1)
            out.append(s)
    return out


def _parse_sheet(data: bytes, sst: list[str], text: list[str]) -> None:
    cur_row = 0
    cur_col = 0

    def col_of(payload) -> int:
        nonlocal cur_col
        (column,) = struct.unpack_from("<I", payload, 0)
        if cur_col > 0:
            text.append("\t")
        while column > cur_col:
            text.append("\t")
            cur_col += 1
        cur_col = column + 1
        return column

    r = _Reader(data)
    while not r.done():
        t, payload = r.record()
        if t == 0x00:  # BrtRowHdr
            (row,) = struct.unpack_from("<I", payload, 0)
            for _ in range(cur_row, row):
                text.append("\n")
            cur_row = row
            cur_col = 0
        elif t == 0x01:  # BrtCellBlank
            col_of(payload)
        elif t in (0x03, 0x0B):  # error
            col_of(payload)
            text.append(_ERROR_CODES.get(payload[8], ""))
        elif t in (0x04, 0x0A):  # bool
            col_of(payload)
            text.append("1" if payload[8] else "0")
        elif t in (0x05, 0x09):  # real / fmla num
            col_of(payload)
            (v,) = struct.unpack_from("<d", payload, 8)
            text.append(_fmt_g(v))
        elif t in (0x06, 0x08):  # inline string / fmla string
            col_of(payload)
            s, _ = _wide_str(payload, 8)
            text.append(s)
        elif t == 0x07:  # isst
            col_of(payload)
            (idx,) = struct.unpack_from("<I", payload, 8)
            if idx < len(sst):
                text.append(sst[idx])
        elif t == 0x02:  # rk
            col_of(payload)
            (uv,) = struct.unpack_from("<I", payload, 8)
            fx100 = bool(uv & 0x1)
            fint = bool(uv & 0x2)
            if fint:
                sv = struct.unpack("<i", struct.pack("<I", uv))[0]
                v = float(int(sv / 4))  # C++ truncating division
                if fx100:
                    v /= 100.0
                # reference: stringify((int)rk.value) — truncates
                text.append(str(int(v)))
            else:
                (v,) = struct.unpack(
                    "<d", b"\x00\x00\x00\x00" + struct.pack("<I", uv & 0xFFFFFFFC)
                )
                if fx100:
                    v /= 100.0
                text.append(_fmt_g(v))


def xlsb_to_events(data: bytes):
    """Returns (events, meta)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    sst = _shared_strings(zf)
    text: list[str] = []
    names = set(zf.namelist())
    i = 1
    while f"xl/worksheets/sheet{i}.bin" in names:
        _parse_sheet(zf.read(f"xl/worksheets/sheet{i}.bin"), sst, text)
        text.append("\n\n")  # after every sheet (xlsb_parser.cpp:541)
        i += 1
    meta = _core_metadata(zf)
    try:
        app = zf.read("docProps/app.xml").decode("utf-8", "replace")
        m = re.search(
            r"<TitlesOfParts>.*?<vt:vector size=\"(\d+)\"", app, re.S
        )
        if m:
            meta["page_count"] = int(m.group(1))
    except KeyError:
        pass
    events = [
        (E.DOCUMENT, None),
        (E.TEXT, "".join(text)),
        (E.CLOSE_DOCUMENT, None),
    ]
    return events, meta
