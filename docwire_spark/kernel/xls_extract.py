"""Minimal XLS (BIFF5/BIFF8) -> document-element event stream.

Reimplements the reference's xls_parser text assembly (reference:
src/xls_parser.cpp, 974 LoC): cells render into one tab/newline
string — row gaps emit newlines, column gaps tabs (cellText,
xls_parser.cpp:421-439) — emitted as a single text event inside
document...close_document (xls_parser.cpp:910-925).

Records: SST/CONTINUE (with the per-CONTINUE flag-byte re-split),
LABELSST, LABEL/RSTRING, NUMBER, RK, MULRK, MULBLANK, BLANK,
INTEGER_CELL, FORMULA (+STRING result), XF/FORMAT for standard date
formats, DATE_1904, EOF (newline; stream ends unless a new BOF
follows).  Numbers format with %.12g; dates via the standard format
id table (xls_parser.cpp:130-148).
"""

from __future__ import annotations

import datetime
import struct

from docwire_spark.kernel import events as E
from docwire_spark.kernel.cfb import CfbFile
from docwire_spark.kernel.doc_extract import _summary_metadata

_DATE_FORMATS = {
    0x0E: "%m-%d-%y", 0x0F: "%d-%b-%y", 0x10: "%d-%b", 0x11: "%b-%d",
    0x12: "%l:%M %p", 0x13: "%l:%M:%S %p", 0x14: "%H:%M",
    0x15: "%H:%M:%S", 0x16: "%m-%d-%y %H:%M", 0x2D: "%M:%S",
    0x2E: "%H:%M:%S", 0x2F: "%M:%S", 0xA4: "%m.%d.%Y %l:%M:%S %p",
}


class _Ctx:
    def __init__(self):
        # the reference's default 8-bit codepage is cp1251
        # (xls_parser.cpp:82) — crash_test.xls golden depends on it
        self.codepage = "cp1251"
        self.biff8 = True
        self.sst: list[str] = []
        self.sst_buf = bytearray()
        self.sst_sizes: list[int] = []
        self.xf_formats: list[int] = []
        self.defined_formats: set[int] = set()
        self.date_shift = 25569.0
        self.last_row = 0
        self.last_col = 0
        self.formula_row = -1
        self.formula_col = -1


def _fmt_num(ctx: _Ctx, num: float, xf_index: int) -> str:
    fmt = None
    if xf_index < len(ctx.xf_formats):
        nfid = ctx.xf_formats[xf_index]
        if nfid not in ctx.defined_formats:
            fmt = _DATE_FORMATS.get(nfid)
    if fmt:
        t = round((num - ctx.date_shift) * 86400)
        dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=t)
        # strftime %l (GNU: blank-padded 12-hour) is not portable
        out = fmt.replace("%l", str((dt.hour % 12) or 12))
        return dt.strftime(out)
    return f"{num:.12g}"


def _rk(ctx: _Ctx, data: bytes, xf_index: int) -> str:
    (raw,) = struct.unpack_from("<I", data, 0)
    if raw & 0x02:
        num = float(struct.unpack_from("<i", data, 0)[0] >> 2)
    else:
        (num,) = struct.unpack("<d", b"\x00\x00\x00\x00" + bytes(
            [data[0] & 0xFC, data[1], data[2], data[3]]
        ))
    if raw & 0x01:
        num *= 0.01
    return _fmt_num(ctx, num, xf_index)


def _unistr(ctx: _Ctx, buf: bytes, pos: int, sizes, rec_idx, rec_pos):
    """XLUnicodeString; returns (text, pos, rec_idx, rec_pos).
    ``sizes`` are the record chunk sizes for CONTINUE re-splits where
    the flags byte repeats (xls_parser.cpp:253-400)."""
    # a previous string's trailing blocks may have jumped past a chunk
    # boundary: renormalize (xls_parser.cpp:355-362)
    while rec_idx < len(sizes) and rec_pos >= sizes[rec_idx]:
        rec_pos -= sizes[rec_idx]
        rec_idx += 1
    if pos + 2 > len(buf):
        return "", len(buf), rec_idx, rec_pos
    (count,) = struct.unpack_from("<H", buf, pos)
    pos += 2
    rec_pos += 2
    flags = 0
    if ctx.biff8:
        if pos >= len(buf):
            return "", pos, rec_idx, rec_pos
        flags = buf[pos]
        pos += 1
        rec_pos += 1
    char_size = 2 if flags & 0x01 else 1
    after = 0
    if flags & 0x08:  # rich text runs
        if pos + 2 > len(buf):
            return "", len(buf), rec_idx, rec_pos
        after += 4 * struct.unpack_from("<H", buf, pos)[0]
        pos += 2
        rec_pos += 2
    if flags & 0x04:  # asian phonetic block
        if pos + 4 > len(buf):
            return "", len(buf), rec_idx, rec_pos
        after += struct.unpack_from("<i", buf, pos)[0]
        pos += 4
        rec_pos += 4
    out = []
    i = 0
    while i < count and pos < len(buf):
        if rec_idx < len(sizes) and rec_pos == sizes[rec_idx]:
            # CONTINUE boundary: flags byte repeats
            rec_idx += 1
            rec_pos = 0
            nf = buf[pos]
            char_size = 2 if nf & 0x01 else 1
            pos += 1
            rec_pos += 1
            continue
        if char_size == 2:
            if pos + 2 > len(buf):
                break
            (uc,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            rec_pos += 2
            if uc == 0:
                i += 1
                continue
            if 0xD800 <= uc < 0xDC00 and pos + 2 <= len(buf):
                (lo,) = struct.unpack_from("<H", buf, pos)
                pos += 2
                rec_pos += 2
                uc = 0x10000 + ((uc - 0xD800) << 10) + (lo - 0xDC00)
            out.append(chr(uc))
        else:
            ch = bytes([buf[pos]])
            pos += 1
            rec_pos += 1
            out.append(ch.decode(ctx.codepage, "replace")
                       if ctx.codepage != "ascii" else ch.decode("ascii", "replace"))
        i += 1
    pos += after
    rec_pos += after
    return "".join(out), pos, rec_idx, rec_pos


def _parse_sst(ctx: _Ctx) -> None:
    buf = bytes(ctx.sst_buf)
    if len(buf) < 8:
        return
    (total,) = struct.unpack_from("<i", buf, 4)
    pos = 8
    rec_idx = 0
    rec_pos = 8
    while pos < len(buf) and len(ctx.sst) <= total:
        s, pos, rec_idx, rec_pos = _unistr(
            ctx, buf, pos, ctx.sst_sizes, rec_idx, rec_pos
        )
        ctx.sst.append(s)


def _cell(ctx: _Ctx, row: int, col: int, s: str) -> str:
    r = []
    while row > ctx.last_row:
        r.append("\n")
        ctx.last_row += 1
        ctx.last_col = 0
    if col > 0 and col <= ctx.last_col:
        r.append("\t")
    while col > ctx.last_col:
        r.append("\t")
        ctx.last_col += 1
    r.append(s)
    return "".join(r)


def _parse_workbook(data: bytes) -> str:
    ctx = _Ctx()
    text: list[str] = []
    pos = 0
    n = len(data)
    prev_type = None
    eof_found = False
    while pos + 4 <= n:
        rec_type, rec_len = struct.unpack_from("<HH", data, pos)
        pos += 4
        rec = data[pos : pos + rec_len]
        pos += rec_len
        if eof_found and rec_type != 0x0809 and rec_type & 0xFF != 0x09:
            break
        if rec_type == 0x003C:  # CONTINUE
            if prev_type == 0x00FC:
                ctx.sst_buf.extend(rec)
                ctx.sst_sizes.append(len(rec))
            continue  # prev_type unchanged
        if prev_type == 0x00FC and ctx.sst_buf and not ctx.sst:
            _parse_sst(ctx)
        if rec_type in (0x0809, 0x0409, 0x0209, 0x0009):  # BOF
            ctx.last_row = 0
            ctx.last_col = 0
            if rec_type == 0x0809 and rec_len >= 2:
                vers = struct.unpack_from("<H", rec, 0)[0]
                ctx.biff8 = vers >= 0x0600
            else:
                ctx.biff8 = False
            eof_found = False
        elif rec_type == 0x0042:  # CODEPAGE
            if rec_len >= 2:
                cp = struct.unpack_from("<H", rec, 0)[0]
                if cp == 367:
                    ctx.codepage = "ascii"
                elif cp != 1200:
                    # unknown codepages keep the previous converter
                    # (reference TextConverter/iconv fails on e.g.
                    # CP10000 and the old one stays active —
                    # crash_test.xls golden depends on it)
                    try:
                        "".encode().decode(f"cp{cp}")
                        ctx.codepage = f"cp{cp}"
                    except (LookupError, ValueError):
                        pass
        elif rec_type == 0x0022:  # DATE1904
            ctx.date_shift = 24107.0
        elif rec_type == 0x000A:  # EOF
            text.append("\n")
            eof_found = True
        elif rec_type == 0x002F:  # FILEPASS
            raise ValueError("file is encrypted")
        elif rec_type in (0x041E, 0x001E):  # FORMAT
            if rec_len >= 2:
                ctx.defined_formats.add(struct.unpack_from("<H", rec, 0)[0])
        elif rec_type in (0x00E0, 0x0043):  # XF
            if rec_len >= 4:
                ctx.xf_formats.append(struct.unpack_from("<H", rec, 2)[0])
        elif rec_type == 0x00FC:  # SST
            ctx.sst_buf = bytearray(rec)
            ctx.sst_sizes = [len(rec)]
            ctx.sst = []
        elif rec_type == 0x00FD:  # LABELSST
            if rec_len >= 8:
                row, col = struct.unpack_from("<HH", rec, 0)
                (idx,) = struct.unpack_from("<i", rec, 6)
                ctx.formula_row = -1
                if 0 <= idx < len(ctx.sst):
                    text.append(_cell(ctx, row, col, ctx.sst[idx]))
        elif rec_type in (0x0204, 0x00D6):  # LABEL / RSTRING
            if rec_len >= 6:
                row, col = struct.unpack_from("<HH", rec, 0)
                ctx.formula_row = -1
                s, _p, _i, _rp = _unistr(
                    ctx, rec, 6, [len(rec) - 6], 0, 0
                )
                text.append(_cell(ctx, row, col, s))
        elif rec_type in (0x0203, 0x0003, 0x0103, 0x0303):  # NUMBER
            if rec_len >= 14:
                row, col, xf = struct.unpack_from("<HHH", rec, 0)
                ctx.formula_row = -1
                (num,) = struct.unpack_from("<d", rec, 6)
                text.append(_cell(ctx, row, col, _fmt_num(ctx, num, xf)))
        elif rec_type == 0x027E:  # RK
            if rec_len >= 10:
                row, col, xf = struct.unpack_from("<HHH", rec, 0)
                ctx.formula_row = -1
                text.append(_cell(ctx, row, col, _rk(ctx, rec[6:10], xf)))
        elif rec_type == 0x00BD:  # MULRK
            if rec_len >= 4:
                row, start_col = struct.unpack_from("<HH", rec, 0)
                (end_col,) = struct.unpack_from("<H", rec, rec_len - 2)
                ctx.formula_row = -1
                off = 4
                for col in range(start_col, end_col + 1):
                    if off + 6 > rec_len:
                        break
                    (xf,) = struct.unpack_from("<H", rec, off)
                    text.append(
                        _cell(ctx, row, col, _rk(ctx, rec[off + 2 : off + 6], xf))
                    )
                    off += 6
        elif rec_type == 0x00BE:  # MULBLANK
            if rec_len >= 4:
                row, start_col = struct.unpack_from("<HH", rec, 0)
                (end_col,) = struct.unpack_from("<H", rec, rec_len - 2)
                for col in range(start_col, end_col + 1):
                    text.append(_cell(ctx, row, col, ""))
        elif rec_type == 0x0201:  # BLANK
            if rec_len >= 4:
                row, col = struct.unpack_from("<HH", rec, 0)
                text.append(_cell(ctx, row, col, ""))
        elif rec_type == 0x0202:  # INTEGER_CELL (BIFF2)
            if rec_len >= 9:
                row, col = struct.unpack_from("<HH", rec, 0)
                (v,) = struct.unpack_from("<H", rec, 7)
                text.append(_cell(ctx, row, col, str(v)))
        elif rec_type == 0x0006:  # FORMULA
            if rec_len >= 14:
                row, col = struct.unpack_from("<HH", rec, 0)
                ctx.formula_row = -1
                if rec[12] == 0xFF and rec[13] == 0xFF:
                    if rec[6] == 0:  # string result follows in STRING
                        ctx.formula_row = row
                        ctx.formula_col = col
                    elif rec[6] == 1:
                        text.append("TRUE" if rec[8] else "FALSE")
                else:
                    (xf,) = struct.unpack_from("<H", rec, 4)
                    (num,) = struct.unpack_from("<d", rec, 6)
                    text.append(_cell(ctx, row, col, _fmt_num(ctx, num, xf)))
        elif rec_type == 0x0207:  # STRING (formula result)
            if ctx.formula_row >= 0:
                s, _p, _i, _rp = _unistr(ctx, rec, 0, [len(rec)], 0, 0)
                text.append(
                    _cell(ctx, ctx.formula_row, ctx.formula_col, s)
                )
        prev_type = rec_type
    else:
        pass
    if pos + 4 > n:
        # synthetic EOF at stream end (xls_parser.cpp:865-867)
        text.append("\n")
    return "".join(text)


def xls_to_events(data: bytes):
    """Returns (events, meta)."""
    cfb = CfbFile(data)
    try:
        wb = cfb.read_stream("Workbook")
    except KeyError:
        wb = cfb.read_stream("Book")
    text = _parse_workbook(wb)
    events = [
        (E.DOCUMENT, None),
        (E.TEXT, text),
        (E.CLOSE_DOCUMENT, None),
    ]
    return events, _summary_metadata(cfb)
