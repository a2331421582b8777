"""Real media container header parsers (kernel.media_headers)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from docwire_spark.kernel import media_headers as M

BUILDERS = {
    "png": M.build_png,
    "jpeg": M.build_jpeg,
    "gif": M.build_gif,
    "bmp": M.build_bmp,
    "webp_vp8": M.build_webp_vp8,
    "webp_vp8l": M.build_webp_vp8l,
    "webp_vp8x": M.build_webp_vp8x,
}


@settings(max_examples=60, deadline=None)
@given(
    name=st.sampled_from(sorted(BUILDERS)),
    w=st.integers(min_value=1, max_value=16383),
    h=st.integers(min_value=1, max_value=16383),
    payload=st.binary(max_size=200),
)
def test_image_build_parse_roundtrip(name, w, h, payload):
    blob = BUILDERS[name](w, h, payload)
    out = M.parse_media_header(blob)
    assert out["format"] == name.split("_")[0]
    assert (out["width"], out["height"]) == (w, h)
    assert out["byte_len"] == len(blob)
    assert out["duration_ms"] is None


@settings(max_examples=30, deadline=None)
@given(
    payload=st.binary(max_size=4000),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.sampled_from([1, 2]),
)
def test_wav_duration_roundtrip(payload, rate, channels):
    blob = M.build_wav(payload, sample_rate=rate, channels=channels)
    out = M.parse_media_header(blob)
    assert out["format"] == "wav"
    byte_rate = rate * channels * 2
    assert out["duration_ms"] == len(payload) * 1000 // byte_rate
    assert out["width"] is None


def test_jpeg_sof_behind_other_segments():
    """SOF after APP0/COM segments — the segment walk must skip them."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    sof = M.build_jpeg(321, 123)[2:]  # strip its SOI
    blob = b"\xff\xd8" + app0 + com + sof
    out = M.parse_media_header(blob)
    assert (out["format"], out["width"], out["height"]) == ("jpeg", 321, 123)


def test_wav_fmt_after_other_chunks():
    """fmt behind a LIST chunk; data chunk terminates the walk."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 32000) + b"\x00" * 10)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    assert M.parse_media_header(blob)["duration_ms"] == 2000


@pytest.mark.parametrize("name", sorted(BUILDERS))
def test_truncated_headers_never_raise(name):
    blob = BUILDERS[name](100, 50, b"payload")
    for cut in range(0, len(blob)):
        out = M.parse_media_header(blob[:cut])
        assert isinstance(out, dict)  # never raises


def test_negative_bmp_height_is_top_down_flag():
    import struct

    blob = bytearray(M.build_bmp(10, 20))
    struct.pack_into("<i", blob, 22, -20)
    out = M.parse_media_header(bytes(blob))
    assert out["height"] == 20  # abs(): top-down rows, same pixel height


def test_media_blob_builder_cycles_all_formats():
    from docwire_spark.ops.multimodal import build_media_blob

    seen = set()
    for doc_id in range(24):
        out = M.parse_media_header(build_media_blob(doc_id, b"x" * 10))
        seen.add(out["format"])
        assert out["format"] in ("png", "jpeg", "gif", "bmp", "webp", "wav")
    assert seen == {"png", "jpeg", "gif", "bmp", "webp", "wav"}
