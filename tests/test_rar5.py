"""RAR5 decoder: byte-exact decompression against known members and
the archive golden (prefix-exact: the tail is tesseract output for the
embedded jpeg, like the other archive goldens)."""

from __future__ import annotations

import random

from docwire_spark.kernel.api import extract
from docwire_spark.kernel.rar5 import RarError, iter_rar5
from tests.conftest import reference_fixture


def test_members_decompress_byte_exact():
    data = reference_fixture("test.rar")
    members = dict(iter_rar5(data))
    assert members["1.doc"] == reference_fixture("1.doc")
    assert members["2.docx"] == reference_fixture("2.docx")
    assert set(members) == {"1.doc", "2.docx", "subfolder/subarchive.rar",
                            "subfolder/3.jpeg"}


def test_nested_rar_recurses():
    data = reference_fixture("test.rar")
    inner = dict(iter_rar5(data))["subfolder/subarchive.rar"]
    inner_members = dict(iter_rar5(inner))
    assert set(inner_members) == {"5.pdf", "6.xls"}
    assert inner_members["5.pdf"].startswith(b"%PDF-")


def test_rar_golden_prefix_exact():
    data = reference_fixture("test.rar")
    exp = reference_fixture("test.rar.out")
    r = extract(data, url="test.rar")
    assert r.error is None
    assert r.mime == "application/vnd.rar"
    assert exp.startswith(r.text)
    # only the OCR tail of the embedded jpeg is missing (no tesseract)
    missing = exp[len(r.text):]
    assert b"Testing 75 dpi image" in missing


def test_password_protected_rar_errors_honestly():
    data = reference_fixture("test_with_password.rar")
    r = extract(data, url="p.rar")
    assert r is not None  # must not raise; encrypted -> per-row error


def test_mutations_never_raise():
    data = bytearray(reference_fixture("test.rar"))
    rng = random.Random(13)
    for _ in range(60):
        buf = bytearray(data)
        for _ in range(rng.randint(1, 5)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        r = extract(bytes(buf), url="m.rar")
        assert r is not None


def test_truncations_never_raise():
    data = reference_fixture("test.rar")
    for cut in (0, 7, 8, 30, 100, 2000, len(data) // 2):
        r = extract(data[:cut], url="t.rar")
        assert r is not None


def test_rar4_rejected():
    import pytest

    with pytest.raises(RarError):
        list(iter_rar5(b"Rar!\x1a\x07\x00" + b"\x00" * 64))
