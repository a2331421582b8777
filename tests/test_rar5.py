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


def test_decompression_bomb_claim_rejected():
    """A crafted header claiming a multi-GB unp_size must raise before
    any decode work (ADVICE r2: bomb guard for untrusted crawl data)."""
    import struct
    import zlib

    import pytest

    from docwire_spark.kernel.rar5 import MAX_MEMBER_BYTES, _Rar5Decoder

    def vint(n):
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out

    def block(htype, fields, data=b""):
        body = vint(htype) + fields
        hdr = vint(len(body)) + body
        return struct.pack("<I", zlib.crc32(hdr)) + hdr + data

    nm = b"bomb.bin"
    huge = MAX_MEMBER_BYTES + 1
    data = b"Rar!\x1a\x07\x01\x00"
    data += block(1, vint(0) + vint(0))
    data += block(2, vint(2) + vint(4) + vint(0) + vint(huge)
                  + vint(0) + vint(0x80) + vint(0)  # method 1 (compressed)
                  + vint(len(nm)) + nm, b"\x00\x00\x00\x00")
    data += block(5, vint(0) + vint(0))
    with pytest.raises(RarError, match="too large"):
        list(iter_rar5(data))
    with pytest.raises(RarError, match="too large"):
        _Rar5Decoder(b"", huge)
    # …and through extract() it lands in the error column, not a raise
    r = extract(data, url="bomb.rar")
    assert r.error is not None


def test_encrypted_fixture_raises_rar_error():
    """The extra-area file-encryption record (type 0x01) is detected:
    a stored encrypted member can no longer leak ciphertext as its
    payload (ADVICE r2)."""
    import pytest

    data = reference_fixture("test_with_password.rar")
    with pytest.raises(RarError, match="encrypted"):
        list(iter_rar5(data))
    r = extract(data, url="p.rar")
    assert r.error is not None


def test_archive_member_caps():
    """zip/tar/gz paths reject oversized members (declared or real)."""
    import io
    import tarfile
    import zipfile

    import pytest

    from docwire_spark.kernel import archive_extract as A

    # tar with a lying huge size field
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("big.bin")
        info.size = 10
        tf.addfile(info, io.BytesIO(b"x" * 10))
    raw = bytearray(buf.getvalue())
    # patch the size field (octal at offset 124) to > cap
    raw[124:136] = b"77777777777\x00"
    with pytest.raises((A.ArchiveError, tarfile.TarError)):
        list(A.iter_entries(bytes(raw), "application/x-tar"))

    # zip truth check passes for small members
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("ok.txt", "hello")
    out = list(A.iter_entries(zbuf.getvalue(), "application/zip"))
    assert out == [("ok.txt", b"hello")]

    # gz bomb: 100 KB of zeros with the cap lowered to 10 KB
    import gzip as _gzip

    bomb = _gzip.compress(b"\x00" * 100_000)
    old = A.MAX_MEMBER_BYTES
    A.MAX_MEMBER_BYTES = 10_000
    try:
        with pytest.raises(A.ArchiveError, match="too large"):
            list(A.iter_entries(bomb, "application/gzip", url="b.gz"))
    finally:
        A.MAX_MEMBER_BYTES = old
