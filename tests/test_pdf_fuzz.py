"""Robustness of the modern-PDF machinery: malformed xref streams,
object streams, filters, and CID fonts must surface as a per-row
``error`` (PdfError -> extraction API), never an unhandled exception.
"""

from __future__ import annotations

import random
import zlib

import pytest

from docwire_spark.kernel.api import extract
from docwire_spark.kernel.pdfminer_lite import (
    PdfError, _apply_predictor, _ascii85_decode, _asciihex_decode,
    _lzw_decode, _runlength_decode,
)
from tests.test_pdf_modern import _classic_pdf, _modern_pdf


def _assert_row_safe(data: bytes, url: str):
    r = extract(data, url=url)  # must not raise
    return r


def test_mutated_modern_pdf_never_raises():
    base = _modern_pdf("fuzz target text")
    rng = random.Random(42)
    for trial in range(200):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 8)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        _assert_row_safe(bytes(buf), "m.pdf")


def test_truncated_modern_pdf_never_raises():
    base = _modern_pdf("truncate me")
    for cut in range(1, len(base), max(1, len(base) // 64)):
        _assert_row_safe(base[:cut], "t.pdf")


def test_mutated_classic_pdf_never_raises():
    base = _classic_pdf("classic fuzz")
    rng = random.Random(7)
    for trial in range(200):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        _assert_row_safe(bytes(buf), "c.pdf")


@pytest.mark.parametrize("fn", [
    _lzw_decode, _ascii85_decode, _asciihex_decode, _runlength_decode,
])
def test_filters_raise_only_pdferror_on_garbage(fn):
    rng = random.Random(3)
    for trial in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 64)))
        try:
            fn(blob)
        except PdfError:
            pass  # the contract: malformed input -> PdfError only


def test_predictor_raises_only_pdferror_on_garbage():
    rng = random.Random(5)
    for trial in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 64)))
        try:
            _apply_predictor(blob, rng.choice([2, 10, 11, 12, 15]),
                             1, 8, rng.randrange(1, 8))
        except PdfError:
            pass


def test_objstm_cycle_is_bounded():
    """An ObjStm whose container references itself must not recurse
    forever (the cache-first guard in _objstm_objects)."""
    body = b"1 0 "  # header claims obj 1 at offset 0
    sc = zlib.compress(body + b"<< /X 2 0 R >>")
    pdf = (
        b"%PDF-1.6\n"
        b"2 0 obj\n<< /Type /ObjStm /N 1 /First 4 /Length "
        + str(len(sc)).encode() + b" /Filter /FlateDecode >>\nstream\n"
        + sc + b"\nendstream\nendobj\n"
    )
    _assert_row_safe(pdf, "o.pdf")


def test_xref_chain_loop_is_bounded():
    """Two classic xrefs whose /Prev fields point at each other must
    terminate (the seen-offset set in _load_xref_chain)."""
    base = _classic_pdf("loop")
    x1 = base.rfind(b"xref")
    looped = base.replace(
        b"/Root 1 0 R >>",
        b"/Root 1 0 R /Prev " + str(x1).encode() + b" >>",
    )
    _assert_row_safe(looped, "l.pdf")
