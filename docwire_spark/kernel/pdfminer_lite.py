"""Minimal pure-Python PDF text extractor (no PDFium in this
environment).

Produces, per page, text elements shaped like the reference's PDFium
page objects (reference: src/pdf_parser.cpp:259-335 — one element per
text-showing operator with device-space bounds and font size):

    (text, x, y, width, height, font_size)

Bounds reproduce PDFium's tight glyph boxes: for embedded TrueType
fonts the per-glyph bounding boxes are read from the font's ``glyf``
table (PDFium unions per-char glyph boxes scaled by the text matrix);
fonts without an embedded program fall back to ascent/descent metrics.

Scope: what Common-Crawl-ish / office-exported PDFs need — the
constructs PDFium gives the reference for free (src/pdf_parser.cpp:
28-32):

- classic xref tables AND PDF 1.5+ cross-reference streams, chained
  via /Prev (incremental updates) and /XRefStm (hybrid files), with a
  scan-all-objects fallback for damaged xrefs (last definition wins)
- compressed object streams (/ObjStm)
- stream filters: FlateDecode, LZWDecode (with EarlyChange),
  ASCII85Decode, ASCIIHexDecode, RunLengthDecode; PNG + TIFF
  predictors
- page tree with attribute inheritance
- simple fonts (Type1/TrueType, /Widths, WinAnsi + /Differences,
  ToUnicode CMaps) and composite Type0/CID fonts with Identity-H
  encoding, /W width arrays and CIDToGIDMap
- Form XObjects (text inside /Do-invoked forms)
- text operators BT ET Td TD Tm T* TL Tf Tc Tw Tz Ts Tj TJ ' " q Q cm

Unsupported constructs raise :class:`PdfError`, which the extraction
API surfaces as a per-row ``error`` value.
"""

from __future__ import annotations

import re
import struct
import zlib

__all__ = ["PdfDocument", "PdfError"]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(Exception):
    pass


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num, gen):
        self.num = num
        self.gen = gen

    def __repr__(self):  # pragma: no cover
        return f"Ref({self.num},{self.gen})"


class Name(str):
    """PDF name (distinct from string values)."""


# ---------------------------------------------------------------------------
# object syntax
# ---------------------------------------------------------------------------


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n:
        c = buf[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_KW_RE = re.compile(rb"[A-Za-z'\"*]+")


def parse_object(buf: bytes, i: int):
    """Parse one object at offset i; returns (obj, next_offset)."""
    i = _skip_ws(buf, i)
    if i >= len(buf):
        raise PdfError("unexpected end of data")
    c = buf[i]
    if c == 0x2F:  # /name
        j = i + 1
        n = len(buf)
        while j < n and buf[j] not in _WS and buf[j] not in _DELIM:
            j += 1
        raw = buf[i + 1 : j]
        if b"#" in raw:
            raw = re.sub(
                rb"#([0-9A-Fa-f]{2})",
                lambda m: bytes([int(m.group(1), 16)]),
                raw,
            )
        return Name(raw.decode("latin-1")), j
    if c == 0x3C:  # << dict or <hex>
        if buf[i : i + 2] == b"<<":
            d = {}
            i += 2
            while True:
                i = _skip_ws(buf, i)
                if buf[i : i + 2] == b">>":
                    return d, i + 2
                key, i = parse_object(buf, i)
                if not isinstance(key, Name):
                    raise PdfError("dict key is not a name")
                val, i = parse_object(buf, i)
                d[str(key)] = val
        j = buf.index(b">", i)
        hx = re.sub(rb"\s+", b"", buf[i + 1 : j])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii")), j + 1
    if c == 0x28:  # (string)
        return _parse_literal_string(buf, i)
    if c == 0x5B:  # [ array
        arr = []
        i += 1
        while True:
            i = _skip_ws(buf, i)
            if buf[i] == 0x5D:
                return arr, i + 1
            v, i = parse_object(buf, i)
            arr.append(v)
    m = _NUM_RE.match(buf, i)
    if m and m.start() == i:
        tok = m.group()
        j = m.end()
        # "N G R" reference lookahead
        if b"." not in tok and not tok.startswith(b"-"):
            k = _skip_ws(buf, j)
            m2 = _NUM_RE.match(buf, k)
            if m2 and b"." not in m2.group():
                k2 = _skip_ws(buf, m2.end())
                if buf[k2 : k2 + 1] == b"R" and (
                    k2 + 1 >= len(buf)
                    or buf[k2 + 1] in _WS
                    or buf[k2 + 1] in _DELIM
                ):
                    return Ref(int(tok), int(m2.group())), k2 + 1
        return (float(tok) if b"." in tok else int(tok)), j
    m = _KW_RE.match(buf, i)
    if m:
        kw = m.group()
        if kw == b"true":
            return True, m.end()
        if kw == b"false":
            return False, m.end()
        if kw == b"null":
            return None, m.end()
        return ("op", kw.decode("latin-1")), m.end()
    raise PdfError(f"cannot parse object at {i}: {buf[i:i+20]!r}")


def _parse_literal_string(buf: bytes, i: int):
    assert buf[i] == 0x28
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in b"nrtbf":
                out += {
                    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                    0x62: b"\b", 0x66: b"\f",
                }[e]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:
                oct_digits = bytes([e])
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= buf[i] <= 0x37:
                    oct_digits += bytes([buf[i]])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e == 0x0A:
                i += 1
            elif e == 0x0D:
                i += 1
                if i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise PdfError("unterminated string")


# ---------------------------------------------------------------------------
# stream filters
# ---------------------------------------------------------------------------


def _apply_predictor(data: bytes, predictor: int, colors: int, bpc: int,
                     columns: int) -> bytes:
    """PNG predictors 10-15 (per-row filter byte) and TIFF predictor 2."""
    bpp = max(1, (colors * bpc + 7) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing (8-bit only)
        if bpc != 8:
            raise PdfError("TIFF predictor with bpc != 8 not supported")
        out = bytearray(data)
        for r in range(0, len(out), row_len):
            for j in range(r + bpp, min(r + row_len, len(out))):
                out[j] = (out[j] + out[j - bpp]) & 0xFF
        return bytes(out)
    if predictor < 10:
        raise PdfError(f"unsupported predictor {predictor}")
    out = bytearray()
    prev = bytearray(row_len)
    i = 0
    n = len(data)
    while i < n:
        ft = data[i]
        i += 1
        row = bytearray(data[i:i + row_len])
        i += len(row)
        if ft == 1:  # Sub
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise PdfError(f"bad PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZW as specified for PDF: 9..12-bit codes, clear=256, eod=257,
    code width grows ``early`` codes before the table fills."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    code_len = 9
    prev = None
    bitbuf = 0
    bits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bits += 8
        while bits >= code_len:
            bits -= code_len
            code = (bitbuf >> bits) & ((1 << code_len) - 1)
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code = 258
                code_len = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise PdfError("bad LZW start code")
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:
                    entry = prev + prev[:1]
                else:
                    raise PdfError("bad LZW code")
                table[next_code] = prev + entry[:1]
                next_code += 1
            out += entry
            prev = entry
            if next_code + early >= (1 << code_len) and code_len < 12:
                code_len += 1
    return bytes(out)


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = re.sub(rb"\s+", b"", data)
    if body.startswith(b"<~"):
        body = body[2:]
    if body.endswith(b"~>"):
        body = body[:-2]
    try:
        return base64.a85decode(body)
    except ValueError as exc:
        raise PdfError(f"bad ASCII85 stream: {exc}") from exc


def _asciihex_decode(data: bytes) -> bytes:
    body = re.sub(rb"\s+", b"", data)
    if body.endswith(b">"):
        body = body[:-1]
    if len(body) % 2:
        body += b"0"
    try:
        return bytes.fromhex(body.decode("ascii"))
    except ValueError as exc:
        raise PdfError(f"bad ASCIIHex stream: {exc}") from exc


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            out += data[i + 1:i + 2 + ln]
            i += 2 + ln
        else:
            out += data[i + 1:i + 2] * (257 - ln)
            i += 2
    return bytes(out)


# ---------------------------------------------------------------------------
# matrices (a b c d e f) — PDF 3x3 affine, row-vector convention
# ---------------------------------------------------------------------------

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mmul(m, n):
    a, b, c, d, e, f = m
    a2, b2, c2, d2, e2, f2 = n
    return (
        a * a2 + b * c2,
        a * b2 + b * d2,
        c * a2 + d * c2,
        c * b2 + d * d2,
        e * a2 + f * c2 + e2,
        e * b2 + f * d2 + f2,
    )


def _mapply(m, x, y):
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


# ---------------------------------------------------------------------------
# embedded TrueType metrics (tight glyph boxes, like PDFium/FreeType)
# ---------------------------------------------------------------------------


class TrueTypeMetrics:
    def __init__(self, raw: bytes):
        try:
            self._parse(raw)
        except (struct.error, IndexError, ValueError) as exc:
            raise PdfError(f"bad TrueType font program: {exc}") from exc

    def _parse(self, raw: bytes):
        num_tables = struct.unpack(">H", raw[4:6])[0]
        tables = {}
        for k in range(num_tables):
            off = 12 + 16 * k
            tag = raw[off : off + 4]
            toff, tlen = struct.unpack(">II", raw[off + 8 : off + 16])
            tables[tag] = (toff, tlen)
        head_off = tables[b"head"][0]
        self.upem = struct.unpack(">H", raw[head_off + 18 : head_off + 20])[0]
        loc_fmt = struct.unpack(">h", raw[head_off + 50 : head_off + 52])[0]
        maxp_off = tables[b"maxp"][0]
        n_glyphs = struct.unpack(">H", raw[maxp_off + 4 : maxp_off + 6])[0]
        loca_off = tables[b"loca"][0]
        if loc_fmt == 0:
            loca = [
                2 * v
                for v in struct.unpack(
                    f">{n_glyphs + 1}H",
                    raw[loca_off : loca_off + 2 * (n_glyphs + 1)],
                )
            ]
        else:
            loca = list(
                struct.unpack(
                    f">{n_glyphs + 1}I",
                    raw[loca_off : loca_off + 4 * (n_glyphs + 1)],
                )
            )
        glyf_off = tables[b"glyf"][0]
        self.bboxes = []
        for g in range(n_glyphs):
            if loca[g] == loca[g + 1]:
                self.bboxes.append(None)  # empty glyph (e.g. space)
            else:
                o = glyf_off + loca[g]
                _nc, x0, y0, x1, y1 = struct.unpack(">hhhhh", raw[o : o + 10])
                self.bboxes.append((x0, y0, x1, y1))
        self.cmap = self._parse_cmap(raw, tables.get(b"cmap"))

    def _parse_cmap(self, raw: bytes, entry):
        if not entry:
            return None
        base = entry[0]
        n_sub = struct.unpack(">H", raw[base + 2 : base + 4])[0]
        subs = {}
        for k in range(n_sub):
            off = base + 4 + 8 * k
            pid, eid, soff = struct.unpack(">HHI", raw[off : off + 8])
            subs[(pid, eid)] = base + soff
        for key in ((3, 1), (3, 0), (1, 0), (0, 3)):
            if key in subs:
                return self._parse_cmap_subtable(raw, subs[key], key)
        if subs:
            return self._parse_cmap_subtable(
                raw, next(iter(subs.values())), None
            )
        return None

    def _parse_cmap_subtable(self, raw: bytes, off: int, key):
        fmt = struct.unpack(">H", raw[off : off + 2])[0]
        mapping = {}
        if fmt == 0:
            for code in range(256):
                mapping[code] = raw[off + 6 + code]
        elif fmt == 4:
            seg2 = struct.unpack(">H", raw[off + 6 : off + 8])[0]
            segs = seg2 // 2
            ends = struct.unpack(f">{segs}H", raw[off + 14 : off + 14 + seg2])
            s0 = off + 16 + seg2
            starts = struct.unpack(f">{segs}H", raw[s0 : s0 + seg2])
            d0 = s0 + seg2
            deltas = struct.unpack(f">{segs}h", raw[d0 : d0 + seg2])
            r0 = d0 + seg2
            ranges = struct.unpack(f">{segs}H", raw[r0 : r0 + seg2])
            for s in range(segs):
                for code in range(starts[s], min(ends[s], 0xFFFF) + 1):
                    if ranges[s] == 0:
                        gid = (code + deltas[s]) & 0xFFFF
                    else:
                        go = r0 + 2 * s + ranges[s] + 2 * (code - starts[s])
                        gid = struct.unpack(">H", raw[go : go + 2])[0]
                        if gid:
                            gid = (gid + deltas[s]) & 0xFFFF
                    if gid:
                        mapping[code] = gid
        elif fmt == 6:
            first, count = struct.unpack(">HH", raw[off + 6 : off + 10])
            gids = struct.unpack(
                f">{count}H", raw[off + 10 : off + 10 + 2 * count]
            )
            for k, gid in enumerate(gids):
                mapping[first + k] = gid
        else:
            return None
        self._cmap_key = key
        return mapping

    def gid_for_code(self, code: int) -> int:
        if self.cmap is None:
            return code
        if code in self.cmap:
            return self.cmap[code]
        if 0xF000 + code in self.cmap:
            return self.cmap[0xF000 + code]
        return code

    def bbox_for_code(self, code: int):
        """Glyph box in 1000-unit text space, or None for empty glyph."""
        gid = self.gid_for_code(code)
        if gid >= len(self.bboxes):
            return None
        bb = self.bboxes[gid]
        if bb is None:
            return None
        s = 1000.0 / self.upem
        return (bb[0] * s, bb[1] * s, bb[2] * s, bb[3] * s)


# ---------------------------------------------------------------------------
# fonts
# ---------------------------------------------------------------------------

# WinAnsiEncoding == cp1252 for the printable range; unmapped cp1252
# holes decode via latin-1 fallback
def _winansi(code: int) -> str:
    try:
        return bytes([code]).decode("cp1252")
    except UnicodeDecodeError:
        return bytes([code]).decode("latin-1")


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _utf16be_hex(hx: bytes) -> str:
    b = bytes.fromhex(hx.decode("ascii"))
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> dict:
    out = {}
    for m in _BFCHAR_RE.finditer(data):
        hexes = _HEX_RE.findall(m.group(1))
        for k in range(0, len(hexes) - 1, 2):
            out[int(hexes[k], 16)] = _utf16be_hex(hexes[k + 1])
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        i = 0
        toks = []
        while i < len(body):
            i2 = _skip_ws(body, i)
            if i2 >= len(body):
                break
            try:
                obj, i = parse_object(body, i2)
            except PdfError:
                break
            toks.append(obj)
        i = 0
        while i + 2 < len(toks) + 1 and i + 2 <= len(toks) - 1 or i + 2 < len(toks):
            lo, hi, dst = toks[i], toks[i + 1], toks[i + 2]
            i += 3
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            if isinstance(dst, list):
                for k, d in enumerate(dst):
                    out[lo_i + k] = (
                        d.decode("utf-16-be", "replace")
                        if isinstance(d, bytes)
                        else str(d)
                    )
            elif isinstance(dst, bytes):
                base = int.from_bytes(dst, "big")
                width = max(2, len(dst))
                for code in range(lo_i, hi_i + 1):
                    out[code] = chr(base + (code - lo_i)) if base + (
                        code - lo_i
                    ) <= 0x10FFFF else "�"
                    _ = width
    return out


class Font:
    def __init__(self, doc: "PdfDocument", d: dict):
        self.subtype = str(d.get("Subtype", ""))
        self.is_cid = self.subtype == "Type0"
        self.code_bytes = 1
        self.cid_widths = None
        self.default_width = 1000.0
        self.cid_to_gid = None  # None = Identity
        if self.is_cid:
            d = self._init_type0(doc, d)
        self.first_char = int(doc.resolve(d.get("FirstChar", 0)) or 0)
        widths = doc.resolve(d.get("Widths"))
        self.widths = (
            [float(doc.resolve(w)) for w in widths] if widths else None
        )
        desc = doc.resolve(d.get("FontDescriptor")) or {}
        self.ascent = float(doc.resolve(desc.get("Ascent", 800)) or 800)
        self.descent = float(doc.resolve(desc.get("Descent", -200)) or -200)
        self.missing_width = float(
            doc.resolve(desc.get("MissingWidth", 500)) or 500
        )
        self.to_unicode = None
        tu = doc.resolve(d.get("ToUnicode"))
        if isinstance(tu, dict) and tu.get("__stream__"):
            self.to_unicode = _parse_tounicode(tu["__stream__"])
        enc = doc.resolve(d.get("Encoding"))
        self.differences = {}
        self.base_encoding = None
        if isinstance(enc, Name):
            self.base_encoding = str(enc)
        elif isinstance(enc, dict):
            self.base_encoding = str(enc.get("BaseEncoding", "") or "")
            diffs = doc.resolve(enc.get("Differences"))
            if diffs:
                cur = 0
                for item in diffs:
                    if isinstance(item, (int, float)):
                        cur = int(item)
                    else:
                        self.differences[cur] = str(item)
                        cur += 1
        self.metrics = None
        ff = doc.resolve(desc.get("FontFile2"))
        if isinstance(ff, dict) and ff.get("__stream__"):
            try:
                self.metrics = TrueTypeMetrics(ff["__stream__"])
            except PdfError:
                self.metrics = None

    def _init_type0(self, doc: "PdfDocument", d: dict) -> dict:
        """Composite font: Identity-H/V code space (2-byte codes ==
        CIDs), widths from the descendant CIDFont's /W + /DW, glyph
        ids via /CIDToGIDMap.  Returns a surrogate dict exposing the
        descendant's FontDescriptor and the Type0's ToUnicode to the
        simple-font init path (reference: PDFium CPDF_CIDFont)."""
        enc = doc.resolve(d.get("Encoding"))
        enc_name = str(enc) if isinstance(enc, Name) else ""
        if enc_name not in ("Identity-H", "Identity-V"):
            # non-identity CMaps (e.g. UniJIS-UCS2-H) need external CMap
            # tables; surface as a per-document error, not silent junk
            raise PdfError(f"unsupported Type0 encoding {enc_name!r}")
        self.code_bytes = 2
        desc_fonts = doc.resolve(d.get("DescendantFonts")) or []
        cid = doc.resolve(desc_fonts[0]) if desc_fonts else {}
        cid = cid if isinstance(cid, dict) else {}
        self.default_width = float(doc.resolve(cid.get("DW", 1000)) or 1000)
        self.cid_widths = {}
        w = doc.resolve(cid.get("W"))
        if isinstance(w, list):
            i = 0
            while i < len(w):
                c = doc.resolve(w[i])
                nxt = doc.resolve(w[i + 1]) if i + 1 < len(w) else None
                if isinstance(nxt, list):
                    for k, wv in enumerate(nxt):
                        self.cid_widths[int(c) + k] = float(doc.resolve(wv))
                    i += 2
                elif i + 2 < len(w):
                    wv = float(doc.resolve(w[i + 2]))
                    for cc in range(int(c), int(nxt) + 1):
                        self.cid_widths[cc] = wv
                    i += 3
                else:
                    break
        c2g = doc.resolve(cid.get("CIDToGIDMap"))
        if isinstance(c2g, dict) and c2g.get("__stream__") is not None:
            self.cid_to_gid = c2g["__stream__"]  # 2 bytes per CID, BE
        return {
            "FontDescriptor": cid.get("FontDescriptor"),
            "ToUnicode": d.get("ToUnicode"),
        }

    def iter_codes(self, raw: bytes):
        if self.code_bytes == 2:
            for k in range(0, len(raw) - 1, 2):
                yield (raw[k] << 8) | raw[k + 1]
        else:
            yield from raw

    def unicode_for(self, code: int) -> str:
        if self.to_unicode is not None and code in self.to_unicode:
            return self.to_unicode[code]
        if self.is_cid:
            # Identity CID without ToUnicode: some generators use
            # Unicode code points as CIDs; chr() recovers those and
            # degrades to the replacement char otherwise
            return chr(code) if 0x20 <= code <= 0x10FFFF else "�"
        if code in self.differences:
            name = self.differences[code]
            return _GLYPH_NAMES.get(name, "�")
        return _winansi(code)

    def width_for(self, code: int) -> float:
        if self.is_cid:
            return (self.cid_widths or {}).get(code, self.default_width)
        if self.widths is not None:
            idx = code - self.first_char
            if 0 <= idx < len(self.widths):
                return self.widths[idx]
        return self.missing_width

    def bbox_for(self, code: int):
        if self.metrics is None:
            return None
        if self.is_cid:
            if self.cid_to_gid is not None:
                o = 2 * code
                gid = (
                    int.from_bytes(self.cid_to_gid[o:o + 2], "big")
                    if o + 2 <= len(self.cid_to_gid) else 0
                )
            else:
                gid = code
            if gid >= len(self.metrics.bboxes):
                return None
            bb = self.metrics.bboxes[gid]
            if bb is None:
                return None
            s = 1000.0 / self.metrics.upem
            return (bb[0] * s, bb[1] * s, bb[2] * s, bb[3] * s)
        return self.metrics.bbox_for_code(code)


# minimal Adobe glyph list subset for /Differences in office exports
_GLYPH_NAMES = {
    "space": " ", "hyphen": "-", "period": ".", "comma": ",",
    "quotesingle": "'", "quotedbl": '"', "colon": ":", "semicolon": ";",
    "bullet": "•", "endash": "–", "emdash": "—",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
}
_GLYPH_NAMES.update({c: c for c in "abcdefghijklmnopqrstuvwxyz"})
_GLYPH_NAMES.update({c.upper(): c.upper() for c in "abcdefghijklmnopqrstuvwxyz"})
for _k, _n in enumerate(
    "zero one two three four five six seven eight nine".split()
):
    _GLYPH_NAMES[_n] = str(_k)


# ---------------------------------------------------------------------------
# document
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("not a PDF (missing %PDF- header)")
        self.data = data
        self._offsets = {}
        for m in _OBJ_RE.finditer(data):
            # incremental updates: the LAST definition wins
            self._offsets[int(m.group(1))] = m.end()
        self._cache = {}
        self._in_objstm = {}       # objnum -> (container stream objnum, idx)
        self._objstm_cache = {}    # container objnum -> {objnum: obj}
        self._objstm_indexed = False
        self._trailer = {}
        try:
            self._load_xref_chain()
        except PdfError:
            # damaged/absent xref: the scan index above still serves
            pass
        if not self._offsets and not self._in_objstm:
            raise PdfError("no indirect objects found")

    # -- cross-reference chain --------------------------------------------
    def _load_xref_chain(self):
        """Walk startxref -> (classic table | xref stream) -> /Prev.

        Newest-first: the first entry seen for an object number wins
        (that IS the live version under incremental update).  Entries
        are validated against the byte scan — a type-1 offset that does
        not actually start ``N G obj`` for the right N is ignored, so a
        damaged xref degrades to scan behavior instead of misparsing.
        """
        sx = self.data.rfind(b"startxref")
        if sx < 0:
            raise PdfError("no startxref")
        m = _NUM_RE.search(self.data, sx + 9)
        if not m:
            raise PdfError("bad startxref")
        seen_off = set()
        seen_obj = set()
        queue = [int(m.group())]
        while queue:
            off = queue.pop(0)
            if off in seen_off or not (0 <= off < len(self.data)):
                continue
            seen_off.add(off)
            i = _skip_ws(self.data, off)
            if self.data[i:i + 4] == b"xref":
                tr = self._load_classic_xref(i + 4, seen_obj)
            else:
                tr = self._load_xref_stream(i, seen_obj)
            for key, val in tr.items():
                self._trailer.setdefault(key, val)
            for key in ("XRefStm", "Prev"):
                nxt = tr.get(key)
                if isinstance(nxt, (int, float)):
                    queue.append(int(nxt))

    def _register(self, num: int, entry, seen_obj: set):
        if num in seen_obj:
            return
        seen_obj.add(num)
        if isinstance(entry, int):  # type 1: byte offset of "N G obj"
            mm = _OBJ_RE.match(self.data, entry) or _OBJ_RE.match(
                self.data, _skip_ws(self.data, entry)
            )
            if mm and int(mm.group(1)) == num:
                self._offsets[num] = mm.end()
        else:  # type 2: (container objstm number, index)
            self._in_objstm[num] = entry
            self._offsets.pop(num, None)

    def _load_classic_xref(self, i: int, seen_obj: set) -> dict:
        n = len(self.data)
        while True:
            i = _skip_ws(self.data, i)
            if self.data[i:i + 7] == b"trailer":
                obj, _ = parse_object(self.data, i + 7)
                return obj if isinstance(obj, dict) else {}
            m = _NUM_RE.match(self.data, i)
            if not m:
                raise PdfError("bad xref subsection header")
            first = int(m.group())
            i = _skip_ws(self.data, m.end())
            m = _NUM_RE.match(self.data, i)
            if not m:
                raise PdfError("bad xref subsection count")
            count = int(m.group())
            i = _skip_ws(self.data, m.end())
            for k in range(count):
                if i + 18 > n:
                    raise PdfError("truncated xref table")
                row = self.data[i:i + 20]
                try:
                    off = int(row[0:10])
                except ValueError as exc:
                    raise PdfError("bad xref row") from exc
                kind = row[17:18]
                if kind == b"n":
                    self._register(first + k, off, seen_obj)
                elif kind == b"f":
                    seen_obj.add(first + k)
                # rows are nominally 20 bytes but tolerate 19 (lone \n)
                i += 20 if row[18:20] in (b"\r\n", b" \n", b" \r") else 19
                i = _skip_ws(self.data, i) if k == count - 1 else i

    def _load_xref_stream(self, i: int, seen_obj: set) -> dict:
        mm = _OBJ_RE.match(self.data, i)
        if not mm:
            raise PdfError("xref offset points at neither table nor stream")
        num = int(mm.group(1))
        self._offsets.setdefault(num, mm.end())
        d = self.get(num)
        if not isinstance(d, dict) or str(d.get("Type", "")) != "XRef":
            raise PdfError("not an XRef stream")
        data = d.get("__stream__")
        if data is None:
            raise PdfError(d.get("__stream_error__", "undecodable XRef"))
        w = [int(self.resolve(x)) for x in self.resolve(d.get("W")) or []]
        if len(w) < 3:
            raise PdfError("bad /W")
        size = int(self.resolve(d.get("Size")) or 0)
        index = self.resolve(d.get("Index")) or [0, size]
        index = [int(self.resolve(x)) for x in index]
        row_len = sum(w)
        pos = 0

        def field(row, j):
            s = sum(w[:j])
            return int.from_bytes(row[s:s + w[j]], "big") if w[j] else None

        for k in range(0, len(index) - 1, 2):
            first, count = index[k], index[k + 1]
            for objnum in range(first, first + count):
                row = data[pos:pos + row_len]
                pos += row_len
                if len(row) < row_len:
                    return d
                t = field(row, 0)
                t = 1 if t is None else t  # omitted type defaults to 1
                f2 = field(row, 1) or 0
                f3 = field(row, 2) or 0
                if t == 1:
                    self._register(objnum, f2, seen_obj)
                elif t == 2:
                    self._register(objnum, (f2, f3), seen_obj)
                else:
                    seen_obj.add(objnum)
        return d

    # -- object streams ----------------------------------------------------
    def _objstm_objects(self, stm_num: int) -> dict:
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        out = {}
        self._objstm_cache[stm_num] = out  # placed first: cycle guard
        container = self.get(stm_num)
        if not isinstance(container, dict):
            return out
        data = container.get("__stream__")
        if data is None:
            return out
        try:
            n_objs = int(self.resolve(container.get("N")) or 0)
            first = int(self.resolve(container.get("First")) or 0)
            header = []
            i = 0
            for _ in range(2 * n_objs):
                i = _skip_ws(data, i)
                m = _NUM_RE.match(data, i)
                if not m:
                    break
                header.append(int(m.group()))
                i = m.end()
            for k in range(0, len(header) - 1, 2):
                objnum, rel = header[k], header[k + 1]
                try:
                    obj, _ = parse_object(data, first + rel)
                except PdfError:
                    continue
                out[objnum] = obj
        except (ValueError, TypeError):
            pass
        return out

    def _ensure_objstm_index(self):
        """Fallback discovery of compressed objects when the xref chain
        is absent/damaged: find /Type /ObjStm containers by byte scan
        and index their members."""
        if self._objstm_indexed:
            return
        self._objstm_indexed = True
        for m in re.finditer(rb"/Type\s*/ObjStm\b", self.data):
            # enclosing object = nearest "N G obj" start before the hit
            best = None
            for num, off in self._offsets.items():
                if off <= m.start() and (best is None or off > best[1]):
                    best = (num, off)
            if best is None:
                continue
            for objnum in self._objstm_objects(best[0]):
                self._in_objstm.setdefault(objnum, (best[0], 0))

    # -- object access ----------------------------------------------------
    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self._offsets.get(num)
        if off is None:
            loc = self._in_objstm.get(num)
            if loc is None:
                self._ensure_objstm_index()
                loc = self._in_objstm.get(num)
                if loc is None:
                    return None
            obj = self._objstm_objects(loc[0]).get(num)
            self._cache[num] = obj
            return obj
        obj, end = parse_object(self.data, off)
        if isinstance(obj, dict):
            j = _skip_ws(self.data, end)
            if self.data[j : j + 6] == b"stream":
                j += 6
                if self.data[j : j + 2] == b"\r\n":
                    j += 2
                elif self.data[j : j + 1] in (b"\n", b"\r"):
                    j += 1
                try:
                    obj["__stream__"] = self._decode_stream(obj, j)
                except PdfError as exc:
                    # e.g. DCTDecode image data: tolerated unless some
                    # consumer actually needs the bytes
                    obj["__stream__"] = None
                    obj["__stream_error__"] = str(exc)
        self._cache[num] = obj
        return obj

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, Ref):
            if depth > 32:
                raise PdfError("reference cycle")
            obj = self.get(obj.num)
            depth += 1
        return obj

    def _decode_stream(self, d: dict, start: int) -> bytes:
        length = self.resolve(d.get("Length"))
        raw = None
        if isinstance(length, (int, float)):
            end = start + int(length)
            tail = self.data[end : end + 20].lstrip(b"\r\n \t")
            if tail.startswith(b"endstream"):
                raw = self.data[start:end]
        if raw is None:  # unreliable /Length: search
            e = self.data.find(b"endstream", start)
            if e < 0:
                raise PdfError("unterminated stream")
            raw = self.data[start:e].rstrip(b"\r\n")
        filters = self.resolve(d.get("Filter"))
        if filters is None:
            return raw
        if not isinstance(filters, list):
            filters = [filters]
        parms = self.resolve(d.get("DecodeParms"))
        if parms is not None and not isinstance(parms, list):
            parms = [parms]
        for k, f in enumerate(filters):
            fname = str(self.resolve(f))
            p = self.resolve(parms[k]) if parms and k < len(parms) else None
            p = p if isinstance(p, dict) else {}
            if fname in ("FlateDecode", "Fl"):
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as exc:
                    raise PdfError(f"bad flate stream: {exc}") from exc
            elif fname in ("LZWDecode", "LZW"):
                raw = _lzw_decode(
                    raw, int(self.resolve(p.get("EarlyChange", 1)) or 1)
                )
            elif fname in ("ASCII85Decode", "A85"):
                raw = _ascii85_decode(raw)
            elif fname in ("ASCIIHexDecode", "AHx"):
                raw = _asciihex_decode(raw)
            elif fname in ("RunLengthDecode", "RL"):
                raw = _runlength_decode(raw)
            elif fname == "Crypt":
                raise PdfError("encrypted streams not supported")
            else:
                raise PdfError(f"unsupported stream filter {fname}")
            pred = int(self.resolve(p.get("Predictor", 1)) or 1)
            if pred > 1:
                raw = _apply_predictor(
                    raw, pred,
                    int(self.resolve(p.get("Colors", 1)) or 1),
                    int(self.resolve(p.get("BitsPerComponent", 8)) or 8),
                    int(self.resolve(p.get("Columns", 1)) or 1),
                )
        return raw

    # -- structure --------------------------------------------------------
    def catalog(self) -> dict:
        root = self.resolve(self._trailer.get("Root"))
        if isinstance(root, dict) and "Pages" in root:
            return root
        for num in list(self._offsets):
            obj = self.get(num)
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "Catalog":
                return obj
        self._ensure_objstm_index()
        for num in list(self._in_objstm):
            obj = self.get(num)
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "Catalog":
                return obj
        raise PdfError("no document catalog")

    def pages(self):
        cat = self.catalog()
        root = self.resolve(cat.get("Pages"))
        if not isinstance(root, dict):
            raise PdfError("no page tree")
        out = []

        def walk(node, inherited):
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for key in ("Resources", "MediaBox", "Rotate"):
                if key in node:
                    inh[key] = node[key]
            t = str(node.get("Type", ""))
            if t == "Pages" or (t != "Page" and "Kids" in node):
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh)
            else:
                out.append(PdfPage(self, node, inh))

        walk(root, {})
        return out

    def metadata(self) -> dict:
        meta = {}
        info = self.resolve(self._trailer.get("Info"))
        candidates = [info] if isinstance(info, dict) else []
        if not candidates:
            for num in self._offsets:
                obj = self.get(num)
                if isinstance(obj, dict) and (
                    "Producer" in obj or "Creator" in obj or "Author" in obj
                ) and "Type" not in obj:
                    candidates.append(obj)
                    break
        for obj in candidates[:1]:
            for src, dst in (
                ("Author", "author"),
                ("CreationDate", "creation_date"),
                ("ModDate", "last_modification_date"),
            ):
                v = self.resolve(obj.get(src))
                if isinstance(v, bytes):
                    meta[dst] = v.decode("latin-1", "replace")
        try:
            meta["page_count"] = len(self.pages())
        except PdfError:
            pass
        return meta


# ---------------------------------------------------------------------------
# content interpreter
# ---------------------------------------------------------------------------


class PdfPage:
    def __init__(self, doc: PdfDocument, node: dict, inherited: dict):
        self.doc = doc
        self.node = node
        self.inherited = inherited

    def _content(self) -> bytes:
        c = self.doc.resolve(self.node.get("Contents"))
        if c is None:
            return b""
        if isinstance(c, list):
            parts = []
            for ref in c:
                s = self.doc.resolve(ref)
                if isinstance(s, dict):
                    if s.get("__stream__") is None and "__stream_error__" in s:
                        raise PdfError(s["__stream_error__"])
                    parts.append(s.get("__stream__") or b"")
            return b"\n".join(parts)
        if isinstance(c, dict):
            if c.get("__stream__") is None and "__stream_error__" in c:
                raise PdfError(c["__stream_error__"])
            return c.get("__stream__") or b""
        return b""

    def _fonts_from(self, res) -> dict:
        fonts = {}
        if isinstance(res, dict):
            fd = self.doc.resolve(res.get("Font"))
            if isinstance(fd, dict):
                for name, ref in fd.items():
                    d = self.doc.resolve(ref)
                    if isinstance(d, dict):
                        fonts[name] = Font(self.doc, d)
        return fonts

    def text_elements(self):
        """Elements (text, x, y, w, h, font_size), one per show op."""
        res = self.doc.resolve(
            self.node.get("Resources", self.inherited.get("Resources"))
        )
        elements = []
        self._exec(self._content(), res, _ID, elements, 0)
        return elements

    def _exec(self, buf, res, base_ctm, elements, depth):
        """Run one content stream; recurses into Form XObjects on Do
        (text inside forms — ubiquitous in modern generators)."""
        fonts = self._fonts_from(res)

        ctm = base_ctm
        stack = []
        font = None
        fs = 0.0
        tc = 0.0
        tw = 0.0
        th = 1.0  # Tz horizontal scale / 100
        tl = 0.0
        rise = 0.0
        tm = _ID
        tlm = _ID

        def show(items):
            nonlocal tm
            if font is None:
                return
            text_parts = []
            x0 = y0 = float("inf")
            x1 = y1 = float("-inf")
            pen = 0.0  # x offset in unscaled text space
            start_pen = 0.0
            for item in items:
                if isinstance(item, (int, float)):
                    # large negative kerning renders as a word gap;
                    # PDFium's text page materializes it as a generated
                    # space character inside the object's text — but
                    # only when the preceding char is not already a
                    # space (3.pdf draws list-number gaps as
                    # space,kern,space and gets NO generated space)
                    if (
                        item <= -100
                        and text_parts
                        and text_parts[-1] != " "
                    ):
                        text_parts.append(" ")
                    pen -= item / 1000.0 * fs * th
                    continue
                for code in font.iter_codes(item):
                    text_parts.append(font.unicode_for(code))
                    bb = font.bbox_for(code)
                    if bb is not None:
                        # char box in text space: glyph units/1000 * fs
                        gx0 = pen + bb[0] / 1000.0 * fs * th
                        gx1 = pen + bb[2] / 1000.0 * fs * th
                        gy0 = rise + bb[1] / 1000.0 * fs
                        gy1 = rise + bb[3] / 1000.0 * fs
                        for tx, ty in (
                            (gx0, gy0), (gx1, gy0), (gx0, gy1), (gx1, gy1)
                        ):
                            dx, dy = _mapply(_mmul(tm, ctm), tx, ty)
                            x0 = min(x0, dx)
                            y0 = min(y0, dy)
                            x1 = max(x1, dx)
                            y1 = max(y1, dy)
                    adv = font.width_for(code) / 1000.0 * fs + tc
                    # word spacing applies to single-byte code 32 only
                    # (PDF 32000-1 §9.3.3); never to 2-byte CID codes
                    if code == 0x20 and font.code_bytes == 1:
                        adv += tw
                    pen += adv * th
            text = "".join(text_parts)
            if x0 > x1:
                # no tight boxes (no embedded metrics, or all-blank):
                # typographic fallback from pen extent + ascent/descent
                a = font.ascent / 1000.0 * fs
                d = font.descent / 1000.0 * fs
                for tx, ty in (
                    (start_pen, rise + d), (pen, rise + d),
                    (start_pen, rise + a), (pen, rise + a),
                ):
                    dx, dy = _mapply(_mmul(tm, ctm), tx, ty)
                    x0 = min(x0, dx)
                    y0 = min(y0, dy)
                    x1 = max(x1, dx)
                    y1 = max(y1, dy)
            if text:
                elements.append((text, x0, y0, x1 - x0, y1 - y0, fs))
            # advance the text matrix by the total displacement
            tm = _mmul((1, 0, 0, 1, pen, 0), tm)

        i = 0
        operands = []
        n = len(buf)
        while True:
            i = _skip_ws(buf, i)
            if i >= n:
                break
            try:
                obj, i = parse_object(buf, i)
            except PdfError:
                break
            if not (isinstance(obj, tuple) and obj and obj[0] == "op"):
                operands.append(obj)
                continue
            op = obj[1]
            try:
                if op == "q":
                    stack.append(ctm)
                elif op == "Q":
                    ctm = stack.pop() if stack else _ID
                elif op == "cm" and len(operands) >= 6:
                    ctm = _mmul(tuple(float(v) for v in operands[-6:]), ctm)
                elif op == "BT":
                    tm = tlm = _ID
                elif op == "ET":
                    pass
                elif op == "Tf" and len(operands) >= 2:
                    font = fonts.get(str(operands[-2]))
                    fs = float(operands[-1])
                elif op == "Td" and len(operands) >= 2:
                    tlm = _mmul(
                        (1, 0, 0, 1, float(operands[-2]), float(operands[-1])),
                        tlm,
                    )
                    tm = tlm
                elif op == "TD" and len(operands) >= 2:
                    tl = -float(operands[-1])
                    tlm = _mmul(
                        (1, 0, 0, 1, float(operands[-2]), float(operands[-1])),
                        tlm,
                    )
                    tm = tlm
                elif op == "Tm" and len(operands) >= 6:
                    tm = tlm = tuple(float(v) for v in operands[-6:])
                elif op == "T*":
                    tlm = _mmul((1, 0, 0, 1, 0.0, -tl), tlm)
                    tm = tlm
                elif op == "TL" and operands:
                    tl = float(operands[-1])
                elif op == "Tc" and operands:
                    tc = float(operands[-1])
                elif op == "Tw" and operands:
                    tw = float(operands[-1])
                elif op == "Tz" and operands:
                    th = float(operands[-1]) / 100.0
                elif op == "Ts" and operands:
                    rise = float(operands[-1])
                elif op == "Tj" and operands:
                    if isinstance(operands[-1], bytes):
                        show([operands[-1]])
                elif op == "TJ" and operands:
                    if isinstance(operands[-1], list):
                        show(operands[-1])
                elif op == "'" and operands:
                    tlm = _mmul((1, 0, 0, 1, 0.0, -tl), tlm)
                    tm = tlm
                    if isinstance(operands[-1], bytes):
                        show([operands[-1]])
                elif op == '"' and len(operands) >= 3:
                    tw = float(operands[-3])
                    tc = float(operands[-2])
                    tlm = _mmul((1, 0, 0, 1, 0.0, -tl), tlm)
                    tm = tlm
                    if isinstance(operands[-1], bytes):
                        show([operands[-1]])
                elif op == "Do" and operands and depth < 8:
                    xobjs = self.doc.resolve(
                        (res or {}).get("XObject")
                    ) if isinstance(res, dict) else None
                    xd = (
                        self.doc.resolve(xobjs.get(str(operands[-1])))
                        if isinstance(xobjs, dict) else None
                    )
                    if (
                        isinstance(xd, dict)
                        and str(xd.get("Subtype", "")) == "Form"
                        and xd.get("__stream__") is not None
                    ):
                        mtx = self.doc.resolve(xd.get("Matrix"))
                        form_ctm = ctm
                        if isinstance(mtx, list) and len(mtx) == 6:
                            form_ctm = _mmul(
                                tuple(float(v) for v in mtx), ctm
                            )
                        inner_res = self.doc.resolve(xd.get("Resources"))
                        self._exec(
                            xd["__stream__"],
                            inner_res if isinstance(inner_res, dict) else res,
                            form_ctm, elements, depth + 1,
                        )
                # all path/color/image operators: ignored
            except (TypeError, ValueError, KeyError):
                pass
            operands = []
        return elements
