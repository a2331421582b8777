"""WEBP magic sniff, data-URL decode, and the pluggable OCR hook.

No tesseract exists in this sandbox, so the OCR-present paths assert
the DEGRADE behavior (alt-text fallback, honest per-row error) and the
decode/plumbing correctness; the recognition path itself is covered by
the engine probe contract (ocr.available() False here).
"""

from __future__ import annotations

import base64

from docwire_spark.kernel import ocr
from docwire_spark.kernel.api import extract
from docwire_spark.kernel.html_extract import decode_data_url
from docwire_spark.kernel.sniff import detect_mime

# 1x1 BMP (valid header, BGR pixel)
_BMP = (
    b"BM" + (70).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
    + (1).to_bytes(4, "little") + (1).to_bytes(4, "little")
    + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
    + b"\x00" * 24 + b"\xff\xff\xff\x00"
)


def test_webp_magic_sniff():
    webp = b"RIFF" + b"\x24\x00\x00\x00" + b"WEBPVP8 " + b"\x00" * 16
    mime, conf = detect_mime(webp)
    assert mime == "image/webp"
    # RIFF that is NOT webp (e.g. WAV) must not claim image/webp
    wav = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVEfmt " + b"\x00" * 16
    mime, _ = detect_mime(wav)
    assert mime != "image/webp"


def test_decode_data_url_reference_semantics():
    payload = b"fake-image-bytes"
    b64 = base64.b64encode(payload).decode()
    assert decode_data_url(f"data:image/png;base64,{b64}") == (
        "image/png", payload
    )
    # mime default when metadata starts with ;base64
    assert decode_data_url(f"data:;base64,{b64}") == (
        "application/octet-stream", payload
    )
    # reference throw cases -> None
    assert decode_data_url("data:image/png;base64") is None   # no comma
    assert decode_data_url(f"data:image/png,{b64}") is None   # not base64
    assert decode_data_url("data:image/png;base64,") is None  # empty
    assert decode_data_url("https://x/y.png") is None
    assert decode_data_url(None) is None


def test_img_data_url_degrades_to_alt_without_engine():
    b64 = base64.b64encode(_BMP).decode()
    html = (
        f'<html><body><p><img src="data:image/bmp;base64,{b64}"'
        ' alt="a chart"> tail</p></body></html>'
    ).encode()
    r = extract(html, url="i.html")
    assert r.error is None
    # the whitespace machine flushes the alt text at the tag boundary,
    # so the following inter-tag space collapses (golden-verified
    # reference behavior for inline replaced elements)
    assert r.text == b"a charttail\n\n"


def test_standalone_image_payload_errors_honestly_without_engine():
    if ocr.available():  # environment with tesseract: not this sandbox
        return
    r = extract(_BMP, url="x.bmp")
    assert r.mime == "image/bmp"
    assert r.error is not None and "OCR engine" in r.error


def test_ocr_hook_absent_is_cached_and_none():
    assert ocr.available() in (True, False)
    if not ocr.available():
        assert ocr.ocr_image(_BMP) is None
