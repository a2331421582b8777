"""Modern-PDF constructs (what PDFium gives the reference for free,
src/pdf_parser.cpp:28-32): cross-reference streams, /ObjStm object
streams, PNG predictors, LZW/ASCII85/ASCIIHex/RunLength filters,
Type0/CID Identity-H fonts with /W widths + ToUnicode, Form XObjects,
and classic incremental updates.

Fixtures are synthesized byte-exactly here (no binary blobs in the
repo) and asserted through the public ``kernel.api.extract`` surface.
"""

from __future__ import annotations

import base64
import struct
import zlib

from docwire_spark.kernel.api import extract
from docwire_spark.kernel.pdfminer_lite import (
    PdfDocument, _apply_predictor, _ascii85_decode, _asciihex_decode,
    _lzw_decode, _runlength_decode,
)

# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Reference LZW encoder for round-trip tests (PDF variant: clear
    code first, 9->12 bit growth ``early`` codes before the boundary)."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_len = 9
    bits: list[tuple[int, int]] = [(256, 9)]
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        bits.append((table[w], code_len))
        table[w + c] = next_code
        next_code += 1
        if next_code + early - 1 >= (1 << code_len) and code_len < 12:
            code_len += 1
        w = c
    if w:
        bits.append((table[w], code_len))
    bits.append((257, code_len))
    out = bytearray()
    acc = n = 0
    for code, ln in bits:
        acc = (acc << ln) | code
        n += ln
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def _classic_pdf(text: str, content_encoder=None, extra_filter=b"") -> bytes:
    stream = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    if content_encoder:
        stream = content_encoder(stream)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>" + extra_filter
        + b"\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for i, o in enumerate(objs, 1):
        offs.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offs:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def _modern_pdf(text: str) -> bytes:
    """xref STREAM (PNG Up predictor) + ObjStm-compressed structure +
    Type0/Identity-H font + Form XObject with an A85+Flate chain."""
    tounicode = (
        b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange <0020> <007E> <0020> endbfrange\n"
        b"endcmap end end"
    )
    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Contents 4 0 R /Resources << /Font << /F1 5 0 R >>"
            b" /XObject << /Fm1 8 0 R >> >> >>"),
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth"
            b" /Encoding /Identity-H /DescendantFonts [6 0 R]"
            b" /ToUnicode 7 0 R >>"),
        (6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            b" /Supplement 0 >> /DW 600"
            b" /W [32 [600 250] 40 50 500] /CIDToGIDMap /Identity >>"),
    ]
    offs, parts, cur = [], [], 0
    for num, b in members:
        offs.append((num, cur))
        parts.append(b)
        cur += len(b) + 1
    body = b" ".join(parts)
    header = b" ".join(b"%d %d" % (n, o) for n, o in offs)
    stm_content = header + b"\n" + body

    hexed = "".join(f"{ord(c):04x}" for c in text)
    inner = f"BT /F1 12 Tf 72 720 Td <{hexed}> Tj ET".encode()
    form_enc = base64.a85encode(zlib.compress(inner)) + b"~>"

    out = bytearray(b"%PDF-1.6\n")
    pos = {}

    def emit(num, d, stream=None):
        pos[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(d)
        if stream is not None:
            out.extend(b"\nstream\n")
            out.extend(stream)
            out.extend(b"\nendstream")
        out.extend(b"\nendobj\n")

    c = zlib.compress(b"q /Fm1 Do Q")
    emit(4, b"<< /Length %d /Filter /FlateDecode >>" % len(c), c)
    emit(7, b"<< /Length %d >>" % len(tounicode), tounicode)
    emit(8, b"<< /Subtype /Form /BBox [0 0 612 792] /Matrix [1 0 0 1 0 0]"
            b" /Resources << /Font << /F1 5 0 R >> >>"
            b" /Filter [/ASCII85Decode /FlateDecode] /Length %d >>"
            % len(form_enc), form_enc)
    sc = zlib.compress(stm_content)
    emit(9, b"<< /Type /ObjStm /N %d /First %d /Length %d"
            b" /Filter /FlateDecode >>"
            % (len(members), len(header) + 1, len(sc)), sc)

    def ent(t, f2, f3):
        return bytes([t]) + struct.pack(">H", f2) + bytes([f3])

    idx = {n: k for k, (n, _) in enumerate(members)}
    xref_pos = len(out)
    rows = [ent(0, 0, 0)]
    for n in range(1, 10):
        if n in idx:
            rows.append(ent(2, 9, idx[n]))
        else:
            rows.append(ent(1, pos[n], 0))
    rows.append(ent(1, xref_pos, 0))  # the xref stream itself (10)
    data = b"".join(rows)
    row_len = 4
    pred, prev = bytearray(), bytes(row_len)
    for i in range(0, len(data), row_len):
        row = data[i:i + row_len]
        pred += bytes([2]) + bytes(
            (row[j] - prev[j]) & 0xFF for j in range(row_len)
        )
        prev = row
    xc = zlib.compress(bytes(pred))
    emit(10, b"<< /Type /XRef /Size 11 /W [1 2 1] /Index [0 11] /Root 1 0 R"
             b" /Filter /FlateDecode"
             b" /DecodeParms << /Predictor 12 /Columns 4 >> /Length %d >>"
             % len(xc), xc)
    assert pos[10] == xref_pos
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)


# ---------------------------------------------------------------------------
# filter units
# ---------------------------------------------------------------------------


def test_lzw_roundtrip():
    for payload in (b"", b"a", b"TOBEORNOTTOBEORTOBEORNOT" * 40,
                    bytes(range(256)) * 3):
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_lzw_early_change_boundary():
    # enough distinct digrams to cross the 9->10 bit boundary
    payload = bytes(
        (i * 7 + j) % 256 for i in range(80) for j in range(13)
    )
    assert _lzw_decode(_lzw_encode(payload)) == payload


def test_ascii85_and_hex_and_runlength():
    raw = b"docwire spark \x00\xff bytes"
    assert _ascii85_decode(base64.a85encode(raw) + b"~>") == raw
    assert _asciihex_decode(raw.hex().encode() + b">") == raw
    # runlength: literal run + repeat run + EOD
    rl = b"\x04docwi" + bytes([257 - 6]) + b"x" + b"\x80"
    assert _runlength_decode(rl) == b"docwi" + b"x" * 6


def test_png_predictor_up_and_sub():
    rows = [bytes([10, 20, 30, 40]), bytes([12, 24, 36, 48])]
    # encode with Up
    enc = bytearray()
    prev = bytes(4)
    for r in rows:
        enc += bytes([2]) + bytes((r[j] - prev[j]) & 0xFF for j in range(4))
        prev = r
    assert _apply_predictor(bytes(enc), 12, 1, 8, 4) == b"".join(rows)
    # encode with Sub
    enc = bytearray()
    for r in rows:
        enc += bytes([1]) + bytes([r[0]]) + bytes(
            (r[j] - r[j - 1]) & 0xFF for j in range(1, 4)
        )
    assert _apply_predictor(bytes(enc), 12, 1, 8, 4) == b"".join(rows)


# ---------------------------------------------------------------------------
# document-level
# ---------------------------------------------------------------------------


def test_modern_pdf_full_stack():
    text = "hello modern pdf world"
    pdf = _modern_pdf(text)
    r = extract(pdf, url="m.pdf")
    assert r.error is None
    assert r.mime == "application/pdf"
    assert r.text == (text + "\n\n").encode()


def test_modern_pdf_cid_widths_parsed():
    doc = PdfDocument(_modern_pdf("hi"))
    page = doc.pages()[0]
    font = page._fonts_from(
        doc.resolve(page.node.get("Resources"))
    )["F1"]
    assert font.is_cid and font.code_bytes == 2
    assert font.width_for(32) == 600.0   # /W [32 [600 250] ...]
    assert font.width_for(33) == 250.0
    assert font.width_for(45) == 500.0   # range 40-50 -> 500
    assert font.width_for(999) == 600.0  # /DW


def test_lzw_content_stream_extracts():
    pdf = _classic_pdf(
        "lzw compressed content", content_encoder=_lzw_encode,
        extra_filter=b"",
    ).replace(b">>\nstream", b" /Filter /LZWDecode >>\nstream", 1)
    # the replace above hits the content stream dict (first stream)
    r = extract(pdf, url="l.pdf")
    assert r.error is None
    assert r.text == b"lzw compressed content\n\n"


def test_asciihex_content_stream_extracts():
    pdf = _classic_pdf(
        "hex content", content_encoder=lambda b: b.hex().encode() + b">",
    ).replace(b">>\nstream", b" /Filter /ASCIIHexDecode >>\nstream", 1)
    r = extract(pdf, url="h.pdf")
    assert r.error is None
    assert r.text == b"hex content\n\n"


def test_incremental_update_classic():
    """Appended revision replaces the content object; the xref chain
    (/Prev) must surface the NEW text."""
    base = _classic_pdf("old text")
    stream = b"BT /F1 12 Tf 72 720 Td (new text) Tj ET"
    out = bytearray(base)
    new_off = len(out)
    out += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(stream)
            + stream + b"\nendstream\nendobj\n")
    xref2 = len(out)
    prev_xref = base.rfind(b"xref")
    # base.rfind finds the literal "xref" inside "startxref"; the real
    # table offset is recorded after the startxref keyword
    prev_off = int(base[base.rfind(b"startxref") + 9:].split()[0])
    out += (b"xref\n4 1\n%010d 00000 n \ntrailer\n<< /Size 6 /Root 1 0 R"
            b" /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (new_off, prev_off, xref2))
    _ = prev_xref
    r = extract(bytes(out), url="u.pdf")
    assert r.error is None
    assert r.text == b"new text\n\n"


def test_classic_pdf_with_damaged_startxref_falls_back_to_scan():
    pdf = _classic_pdf("scan fallback works")
    broken = pdf.replace(b"startxref", b"startxrEf")
    r = extract(broken, url="b.pdf")
    assert r.error is None
    assert r.text == b"scan fallback works\n\n"
