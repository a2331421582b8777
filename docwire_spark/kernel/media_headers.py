"""Real media container header parsers — pure ``struct`` reads, no
codecs (round-3 replacement for the synthetic ``parse_media_header``).

Formats (reference: image::detect handles BMP/WEBP sniffing in
src/image.cpp; dimension/duration extraction itself is public-format
knowledge):

- PNG  — IHDR width/height (u32 big-endian at offset 16/20)
- JPEG — segment walk to SOF0/1/2/... frame header (height, width)
- GIF  — logical screen descriptor (u16 little-endian at 6/8)
- BMP  — BITMAPINFOHEADER biWidth/biHeight (i32le at 18/22)
- WEBP — VP8 (lossy frame tag), VP8L (lossless signature word),
  VP8X (extended canvas) chunk variants
- WAV  — fmt chunk byte rate + data chunk size -> duration_ms

Each ``parse_*`` returns ``(width, height, duration_ms)`` fields where
meaningful, or raises ``MediaHeaderError`` on malformed input; the
top-level ``parse_media_header`` sniffs the container from magic bytes
and never raises (returns ``format=None`` for unknown/short blobs).

Matching ``build_*`` constructors emit minimal valid headers (used by
tests and the synthetic media table) so every parser is covered by a
build->parse roundtrip property.
"""

from __future__ import annotations

import struct


class MediaHeaderError(ValueError):
    pass


# ---------------------------------------------------------------- PNG

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png(b: bytes):
    if len(b) < 24 or b[:8] != PNG_SIG or b[12:16] != b"IHDR":
        raise MediaHeaderError("not a PNG / missing IHDR")
    w, h = struct.unpack_from(">II", b, 16)
    return {"format": "png", "width": w, "height": h, "duration_ms": None}


def build_png(width, height, payload=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (PNG_SIG + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + b"\x00" * 4 + payload)


# --------------------------------------------------------------- JPEG

_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_jpeg(b: bytes):
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise MediaHeaderError("not a JPEG")
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise MediaHeaderError("bad JPEG segment marker")
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF seen
            break
        seg_len = struct.unpack_from(">H", b, i + 2)[0]
        if seg_len < 2 or i + 2 + seg_len > len(b):
            raise MediaHeaderError("truncated JPEG segment")
        if marker in _SOF_MARKERS:
            if seg_len < 7:
                raise MediaHeaderError("short SOF segment")
            h, w = struct.unpack_from(">HH", b, i + 5)
            return {"format": "jpeg", "width": w, "height": h,
                    "duration_ms": None}
        i += 2 + seg_len
    raise MediaHeaderError("no SOF frame header found")


def build_jpeg(width, height, payload=b""):
    sof = struct.pack(">BHH", 8, height, width) + b"\x03" + b"\x00" * 9
    return (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof))
            + sof + payload)


# ---------------------------------------------------------------- GIF


def parse_gif(b: bytes):
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaHeaderError("not a GIF")
    w, h = struct.unpack_from("<HH", b, 6)
    return {"format": "gif", "width": w, "height": h, "duration_ms": None}


def build_gif(width, height, payload=b""):
    return (b"GIF89a" + struct.pack("<HH", width, height)
            + b"\x00\x00\x00" + payload)


# ---------------------------------------------------------------- BMP


def parse_bmp(b: bytes):
    if len(b) < 26 or b[:2] != b"BM":
        raise MediaHeaderError("not a BMP")
    w, h = struct.unpack_from("<ii", b, 18)
    return {"format": "bmp", "width": w, "height": abs(h),
            "duration_ms": None}


def build_bmp(width, height, payload=b""):
    hdr = (b"BM" + struct.pack("<I", 54) + b"\x00" * 4
           + struct.pack("<I", 54)
           + struct.pack("<IiiHH", 40, width, height, 1, 24)
           + b"\x00" * 24)
    return hdr + payload


# --------------------------------------------------------------- WEBP


def parse_webp(b: bytes):
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise MediaHeaderError("not a WEBP")
    fourcc = b[12:16]
    p = b[20:]  # first chunk payload
    if fourcc == b"VP8 ":
        # lossy: 3-byte frame tag, 3-byte start code, then 14-bit dims
        if len(p) < 10 or p[3:6] != b"\x9d\x01\x2a":
            raise MediaHeaderError("bad VP8 start code")
        w = struct.unpack_from("<H", p, 6)[0] & 0x3FFF
        h = struct.unpack_from("<H", p, 8)[0] & 0x3FFF
    elif fourcc == b"VP8L":
        # lossless: 0x2F signature then packed 14-bit width-1/height-1
        if len(p) < 5 or p[0] != 0x2F:
            raise MediaHeaderError("bad VP8L signature")
        v = struct.unpack_from("<I", p, 1)[0]
        w = (v & 0x3FFF) + 1
        h = ((v >> 14) & 0x3FFF) + 1
    elif fourcc == b"VP8X":
        # extended: 4 flag/reserved bytes then 24-bit canvas dims - 1
        if len(p) < 10:
            raise MediaHeaderError("short VP8X chunk")
        w = int.from_bytes(p[4:7], "little") + 1
        h = int.from_bytes(p[7:10], "little") + 1
    else:
        raise MediaHeaderError(f"unknown WEBP chunk {fourcc!r}")
    return {"format": "webp", "width": w, "height": h, "duration_ms": None}


def _riff(fourcc, chunk, payload):
    body = b"WEBP" + fourcc + struct.pack("<I", len(chunk)) + chunk
    return b"RIFF" + struct.pack("<I", len(body) + len(payload)) + body \
        + payload


def build_webp_vp8(width, height, payload=b""):
    chunk = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
             + struct.pack("<HH", width, height))
    return _riff(b"VP8 ", chunk, payload)


def build_webp_vp8l(width, height, payload=b""):
    v = (width - 1) | ((height - 1) << 14)
    return _riff(b"VP8L", b"\x2f" + struct.pack("<I", v), payload)


def build_webp_vp8x(width, height, payload=b""):
    chunk = (b"\x00" * 4 + (width - 1).to_bytes(3, "little")
             + (height - 1).to_bytes(3, "little"))
    return _riff(b"VP8X", chunk, payload)


# ---------------------------------------------------------------- WAV


def parse_wav(b: bytes):
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise MediaHeaderError("not a WAV")
    byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt " and size >= 16 and i + 8 + 16 <= len(b):
            byte_rate = struct.unpack_from("<I", b, i + 16)[0]
        elif cid == b"data":
            data_size = size
            break  # data payload may contain arbitrary bytes: stop
        i += 8 + size + (size & 1)
    if byte_rate is None or data_size is None or byte_rate == 0:
        raise MediaHeaderError("missing fmt/data chunk")
    return {
        "format": "wav", "width": None, "height": None,
        "duration_ms": data_size * 1000 // byte_rate,
    }


def build_wav(payload=b"", sample_rate=8000, channels=1, bits=16):
    byte_rate = sample_rate * channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * bits // 8, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------ dispatch

WAV_BYTE_RATE_DEFAULT = 8000 * 1 * 16 // 8  # build_wav defaults


def parse_media_header(b: bytes) -> dict:
    """Magic-byte sniff + header parse; never raises.  Unknown or
    malformed blobs return ``format None`` with byte_len only."""
    out = {"format": None, "byte_len": len(b), "width": None,
           "height": None, "duration_ms": None}
    try:
        if b[:8] == PNG_SIG:
            out.update(parse_png(b))
        elif b[:2] == b"\xff\xd8":
            out.update(parse_jpeg(b))
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            out.update(parse_gif(b))
        elif b[:2] == b"BM":
            out.update(parse_bmp(b))
        elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            out.update(parse_webp(b))
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            out.update(parse_wav(b))
    except (MediaHeaderError, IndexError, struct.error):
        out["format"] = None
        out["width"] = out["height"] = out["duration_ms"] = None
    return out
