"""WARC / WET container format: writer + streaming reader.

Common Crawl distributes the web as WARC files (ISO 28500 / WARC/1.0):
a sequence of records, each

    WARC/1.0\r\n
    <named fields>\r\n
    \r\n
    <Content-Length bytes of block>\r\n\r\n

``response`` records wrap the full HTTP response (status line +
headers + payload); ``conversion`` records (the .wet files) carry the
already-extracted plain text; a ``warcinfo`` record opens each file.
In the ``.warc.gz`` form every record is compressed as its OWN gzip
member and the members are concatenated — that is what makes the
format record-addressable (a CDX index stores (file, member offset,
member length) and a reader can fetch + gunzip one record without
touching the rest of the file).  This module implements both
directions with bounded memory:

- writer: deterministic bytes (fixed gzip mtime, uuid5 record ids) so
  two runs over the same corpus produce byte-identical files — the
  property the idempotent-commit layer and the DuckDB oracles rely on.
- reader: streams gzip members off a file object one record at a
  time (``zlib.decompressobj(wbits=31)`` + ``unused_data`` to find
  member boundaries); memory is bounded by the largest single record,
  never the file.

Reference parity note: the reference consumes documents as loose
files/streams (src/data_source.cpp); WARC is the container those
documents arrive in at crawl scale, so this is the "first mile" that
feeds docwire_spark.spark.extract.extract_pages.
"""

from __future__ import annotations

import io
import uuid
import zlib
from base64 import b32encode
from datetime import datetime, timezone
from hashlib import sha1

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

#: uuid5 namespace for deterministic WARC-Record-IDs (any fixed UUID
#: works; derived once from the DNS namespace + a project tag).
_RECORD_NS = uuid.uuid5(uuid.NAMESPACE_DNS, "docwire-spark.warc")


def warc_date(ts: datetime) -> str:
    """ISO-8601 Zulu with second precision — the WARC-Date grammar.
    Naive datetimes are taken as UTC (Spark TimestampType hands the
    executor naive UTC wall times; interpreting them via the box's
    local zone would make the output depend on the host)."""
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def payload_digest(payload: bytes) -> str:
    """``sha1:<base32>`` — the WARC-Payload-Digest convention Common
    Crawl uses (labelled-digest grammar from the spec)."""
    return "sha1:" + b32encode(sha1(payload).digest()).decode("ascii")


def _record_id(*parts: str) -> str:
    return f"<urn:uuid:{uuid.uuid5(_RECORD_NS, '|'.join(parts))}>"


def build_record(warc_type: str, block: bytes, fields: dict[str, str]) -> bytes:
    """Serialize one WARC record (uncompressed).  ``fields`` come after
    the auto-filled WARC-Type / Record-ID / Content-Length."""
    hdr = [WARC_VERSION]
    all_fields = {"WARC-Type": warc_type}
    all_fields.update(fields)
    all_fields.setdefault(
        "WARC-Record-ID",
        _record_id(warc_type, all_fields.get("WARC-Target-URI", ""),
                   all_fields.get("WARC-Date", "")),
    )
    all_fields["Content-Length"] = str(len(block))
    for k, v in all_fields.items():
        hdr.append(f"{k}: {v}".encode("utf-8"))
    return _CRLF.join(hdr) + _CRLF * 2 + block + _CRLF * 2


def build_http_response(payload: bytes, status: int = 200,
                        mime: str = "text/html",
                        charset: str | None = "utf-8") -> bytes:
    """Minimal deterministic HTTP/1.1 response block for a ``response``
    record (status line + the headers every CC record carries)."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              503: "Service Unavailable"}.get(status, "Unknown")
    ctype = mime + (f"; charset={charset}" if charset else "")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("ascii")
    return head + payload


def build_response_record(url: str, ts: datetime, payload: bytes,
                          status: int = 200, mime: str = "text/html") -> bytes:
    block = build_http_response(payload, status=status, mime=mime)
    return build_record(
        "response", block,
        {
            "WARC-Target-URI": url,
            "WARC-Date": warc_date(ts),
            "WARC-Payload-Digest": payload_digest(payload),
            "Content-Type": "application/http; msgtype=response",
        },
    )


def build_conversion_record(url: str, ts: datetime, text: bytes,
                            source_file: str = "") -> bytes:
    """A WET-style ``conversion`` record: extracted plain text."""
    fields = {
        "WARC-Target-URI": url,
        "WARC-Date": warc_date(ts),
        "WARC-Payload-Digest": payload_digest(text),
        "Content-Type": "text/plain",
    }
    if source_file:
        fields["WARC-Refers-To-Filename"] = source_file
    return build_record("conversion", text, fields)


def build_warcinfo(filename: str, ts: datetime) -> bytes:
    body = (
        "software: docwire-spark\r\n"
        "format: WARC File Format 1.0\r\n"
        f"isPartOf: {filename}\r\n"
    ).encode("utf-8")
    return build_record(
        "warcinfo", body,
        {
            "WARC-Date": warc_date(ts),
            "WARC-Filename": filename,
            "Content-Type": "application/warc-fields",
        },
    )


def gzip_member(raw: bytes, level: int = 6) -> bytes:
    """One deterministic gzip member (mtime pinned to 0, no filename —
    zlib's wbits=31 header is exactly that)."""
    c = zlib.compressobj(level, zlib.DEFLATED, 31)
    return c.compress(raw) + c.flush()


def write_warc_file(path: str, records, compress: bool = True) -> list[tuple[int, int]]:
    """Write ``records`` (iterable of uncompressed record bytes) to
    ``path``; returns [(offset, length)] per record — compressed member
    extents for .warc.gz, raw extents otherwise (the CDX columns)."""
    extents: list[tuple[int, int]] = []
    off = 0
    with open(path, "wb") as fh:
        for rec in records:
            blob = gzip_member(rec) if compress else rec
            fh.write(blob)
            extents.append((off, len(blob)))
            off += len(blob)
    return extents


# ---------------------------------------------------------------- reader

def iter_gzip_members(fh, chunk_size: int = 1 << 20):
    """Yield ``(offset, compressed_length, raw_bytes)`` per gzip member
    of a multi-member stream, reading ``fh`` in bounded chunks.

    Memory bound: one decompressed member + one input chunk.  Member
    boundaries come from ``decompressobj.eof`` + ``unused_data`` (the
    bytes past the member's trailer that were handed to the obj)."""
    buf = b""
    offset = 0
    exhausted = False
    while True:
        if not buf and not exhausted:
            got = fh.read(chunk_size)
            if got:
                buf = got
            else:
                exhausted = True
        if not buf and exhausted:
            return
        d = zlib.decompressobj(wbits=31)
        out = io.BytesIO()
        consumed = 0
        while not d.eof:
            if not buf:
                got = fh.read(chunk_size)
                if not got:
                    exhausted = True
                    if not d.eof:
                        raise EOFError("truncated gzip member in WARC stream")
                    break
                buf = got
            out.write(d.decompress(buf))
            consumed += len(buf) - len(d.unused_data)
            buf = d.unused_data
        yield offset, consumed, out.getvalue()
        offset += consumed


def parse_warc_record(raw: bytes) -> dict:
    """Parse one uncompressed record -> {fields dict (original-case
    keys), 'block': bytes}.  Tolerates a missing trailing CRLFCRLF."""
    nl = raw.find(b"\r\n")
    version = raw[:nl].decode("ascii", "replace")
    if not version.startswith("WARC/"):
        raise ValueError(f"not a WARC record: {version[:20]!r}")
    head_end = raw.find(b"\r\n\r\n", nl)
    if head_end < 0:
        raise ValueError("WARC record without header terminator")
    fields: dict[str, str] = {}
    for line in raw[nl + 2:head_end].split(b"\r\n"):
        k, _, v = line.partition(b":")
        fields[k.decode("ascii", "replace").strip()] = (
            v.decode("utf-8", "replace").strip()
        )
    n = int(fields.get("Content-Length", "0"))
    block = raw[head_end + 4:head_end + 4 + n]
    return {"version": version, "fields": fields, "block": block}


def split_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split a ``response`` record's block into (status, http headers
    lower-cased, payload)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return 0, {}, block
    head_lines = block[:sep].split(b"\r\n")
    try:
        status = int(head_lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        status = 0
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode("ascii", "replace").strip().lower()] = (
            v.decode("utf-8", "replace").strip()
        )
    return status, headers, block[sep + 4:]


def iter_warc_records(fh, compressed: bool):
    """Yield ``(offset, length, parsed_record_dict)`` from a WARC file
    object.  For ``.warc.gz`` offsets/lengths are the gzip-member
    extents (what a CDX stores); for plain .warc they are raw byte
    extents.  Streaming in both modes."""
    if compressed:
        for off, clen, raw in iter_gzip_members(fh):
            yield off, clen, parse_warc_record(raw)
        return
    # plain: header is line-delimited; block length is declared
    offset = 0
    buf = b""

    def fill(n: int) -> bool:
        nonlocal buf
        while len(buf) < n:
            got = fh.read(max(1 << 16, n - len(buf)))
            if not got:
                return False
            buf += got
        return True

    while True:
        # find end of header (blank line)
        while True:
            head_end = buf.find(b"\r\n\r\n")
            if head_end >= 0:
                break
            got = fh.read(1 << 16)
            if not got:
                if buf.strip():
                    raise EOFError("truncated WARC header")
                return
            buf += got
        header = buf[:head_end]
        for line in header.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                n = int(line.split(b":", 1)[1])
                break
        else:
            raise ValueError("WARC record without Content-Length")
        total = head_end + 4 + n + 4  # header + blank + block + CRLFCRLF
        if not fill(total):
            total = head_end + 4 + n  # tolerate missing trailer at EOF
            if not fill(total):
                raise EOFError("truncated WARC block")
        yield offset, total, parse_warc_record(buf[:total])
        buf = buf[total:]
        offset += total
