"""Content-type detection: magic bytes + url extension + HTML sniff.

Reimplements the reference's detector cascade semantics
(reference: src/content_type.cpp:27-39) with an own magic-byte table in
place of libmagic, tuned for a Common-Crawl-style corpus:

- extension table at confidence HIGH (by_file_extension.cpp:1319-1337)
- magic signatures at VERY_HIGH (by_signature.cpp:57-83, incl. its
  text/xml->application/xml and image/x-ms-bmp->image/bmp quirks)
- HTML sniff: '<html' / '<HTML' in first 1024 bytes -> text/html at
  HIGHEST (content_type_html.cpp:17-29)
- highest-confidence mime wins, alphabetical tie-break
  (data_source.h:240-255)

Confidence scale: none=0 low=1 medium=2 high=3 very_high=4 highest=5.
"""

from __future__ import annotations

NONE, LOW, MEDIUM, HIGH, VERY_HIGH, HIGHEST = range(6)

#: curated entries: formats the vendored mime-db lacks (dcm) plus the
#: reference-pipeline mainstays, kept for direct importers/tests.  For
#: extensions also present in the vendored db, the db rows win (the
#: reference consults only its generated table).
EXTENSION_MIME = {
    "html": "text/html",
    "htm": "text/html",
    "xhtml": "application/xhtml+xml",
    "pdf": "application/pdf",
    "txt": "text/plain",
    "text": "text/plain",
    "md": "text/markdown",
    "csv": "text/csv",
    "css": "text/css",
    "js": "text/javascript",
    "json": "application/json",
    "xml": "application/xml",
    "rss": "application/rss+xml",
    "yaml": "text/yaml",
    "yml": "text/yaml",
    "py": "text/x-python",
    "sh": "application/x-sh",
    "c": "text/x-c",
    "h": "text/x-c++hdr",
    "java": "text/x-java-source",
    "php": "application/x-httpd-php",
    "rtf": "application/rtf",
    "eml": "message/rfc822",
    "doc": "application/msword",
    "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "odg": "application/vnd.oasis.opendocument.graphics",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "xlsb": "application/vnd.ms-excel.sheet.binary.macroenabled.12",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "zip": "application/zip",
    "gz": "application/gzip",
    "bz2": "application/x-bzip2",
    "xz": "application/x-xz",
    "tar": "application/x-tar",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "webp": "image/webp",
    "bmp": "image/bmp",
    "svg": "image/svg+xml",
    "ico": "image/vnd.microsoft.icon",
    "dcm": "application/dicom",
    "pst": "application/vnd.ms-outlook-pst",
    "ost": "application/vnd.ms-outlook-ost",
}

_MAGIC = [
    (b"%PDF-", "application/pdf"),
    (b"\x1f\x8b", "application/gzip"),
    (b"BZh", "application/x-bzip2"),
    (b"\xfd7zXZ\x00", "application/x-xz"),
    (b"PK\x03\x04", "application/zip"),
    (b"PK\x05\x06", "application/zip"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"{\\rtf", "application/rtf"),
    (b"%!PS", "application/postscript"),
    (b"\x7fELF", "application/x-executable"),
    (b"SQLite format 3\x00", "application/vnd.sqlite3"),
    # OLE2 compound file: refined to doc/xls/ppt by directory stream
    # names at parse time (full payload needed; the reference's
    # libmagic path resolves it the same way)
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", "application/x-ole-storage"),
    (b"!BDN", "application/vnd.ms-outlook-pst"),
    (b"Rar!\x1a\x07", "application/vnd.rar"),
]


_ODF_FLAT_MARKERS = [
    (b"application/vnd.oasis.opendocument.text",
     "application/vnd.oasis.opendocument.text-flat-xml"),
    (b"application/vnd.oasis.opendocument.spreadsheet",
     "application/vnd.oasis.opendocument.spreadsheet-flat-xml"),
    (b"application/vnd.oasis.opendocument.presentation",
     "application/vnd.oasis.opendocument.presentation-flat-xml"),
    (b"application/vnd.oasis.opendocument.graphics",
     "application/vnd.oasis.opendocument.graphics-flat-xml"),
]

_OOXML_MARKERS = [
    (b"mimetypeapplication/vnd.oasis.opendocument.text",
     "application/vnd.oasis.opendocument.text"),
    (b"mimetypeapplication/vnd.oasis.opendocument.spreadsheet",
     "application/vnd.oasis.opendocument.spreadsheet"),
    (b"mimetypeapplication/vnd.oasis.opendocument.presentation",
     "application/vnd.oasis.opendocument.presentation"),
    (b"mimetypeapplication/vnd.oasis.opendocument.graphics",
     "application/vnd.oasis.opendocument.graphics"),
    (b"xl/workbook.bin",
     "application/vnd.ms-excel.sheet.binary.macroenabled.12"),
    (b"xl/workbook.xml",
     "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"),
    (b"word/document.xml",
     "application/vnd.openxmlformats-officedocument.wordprocessingml.document"),
    (b"ppt/presentation.xml",
     "application/vnd.openxmlformats-officedocument.presentationml.presentation"),
]


from docwire_spark.kernel.mime_db import MIME_DB_PAIRS

#: extension -> [mime, ...] multimap: the full vendored jshttp mime-db
#: table (1284 rows — §2.2 parity with
#: content_type_by_file_extension.cpp:23-1317), plus curated entries
#: for extensions the db lacks.
EXT_TO_MIMES: dict = {}
for _ext, _mime in MIME_DB_PAIRS:
    EXT_TO_MIMES.setdefault(_ext, []).append(_mime)
for _ext, _mime in EXTENSION_MIME.items():
    EXT_TO_MIMES.setdefault(_ext, [_mime])

#: reverse map mime -> canonical extension (reference
#: content_type_by_file_extension.cpp:1341-1348 ``to_extension``):
#: FIRST occurrence in the vendored list wins (try_emplace loop),
#: curated additions filling the gaps.
_MIME_EXTENSION: dict = {}
for _ext, _mime in MIME_DB_PAIRS:
    _MIME_EXTENSION.setdefault(_mime, _ext)
for _ext, _mime in EXTENSION_MIME.items():
    _MIME_EXTENSION.setdefault(_mime, _ext)


def to_extension(mime: str):
    """Canonical file extension for ``mime``, or None (the reference
    returns std::nullopt for unknown types)."""
    return _MIME_EXTENSION.get(mime)


#: bytes counted as "control" by the binary heuristic: <9, or 14..31
#: excluding ESC.  Kept as a translate deletion table so the count runs
#: at C speed (this sits on the per-document sniff hot path).
_NON_CTL_TABLE = bytes(
    b for b in range(256) if not (b < 9 or (13 < b < 32 and b != 27))
)


def _looks_binary(prefix: bytes) -> bool:
    if not prefix:
        return False
    sample = prefix[:512]
    n_ctl = len(sample.translate(None, delete=_NON_CTL_TABLE))
    return b"\x00" in sample or n_ctl > len(sample) // 10


def detect_mime(data_prefix: bytes, url: str = "") -> tuple:
    """Return (mime, confidence) for a document.

    ``data_prefix`` needs only the first 4 KiB (the reference also
    sniffs bounded prefixes: 1 KiB html, 4 KiB zip).
    """
    mimes = {}  # mime -> confidence (max)

    def add(mime, conf):
        if mime and mimes.get(mime, -1) < conf:
            mimes[mime] = conf

    # 1. by extension: every mime the multimap lists for the
    # extension at HIGH, except the two ambiguous legacy office mimes
    # at MEDIUM (by_file_extension.cpp:1332-1338 — content sniffing
    # may override those)
    if url:
        path = url.split("?", 1)[0].split("#", 1)[0]
        seg = path.rstrip("/").rsplit("/", 1)[-1]
        if "." in seg:
            ext = seg.rsplit(".", 1)[-1].lower()
            for m in EXT_TO_MIMES.get(ext, ()):
                conf = (
                    MEDIUM
                    if m in ("application/msword",
                             "application/vnd.ms-excel")
                    else HIGH
                )
                add(m, conf)

    # 2. by signature (VERY_HIGH), skipped if already >= HIGH
    if not mimes or max(mimes.values()) < HIGH:
        sig_hit = False
        for sig, mime in _MAGIC:
            if data_prefix.startswith(sig):
                # OOXML refinement: ZIP local headers in the first 4KB
                # name the payload (content_type_odf_ooxml.cpp:19-60)
                if mime == "application/zip":
                    for marker, ooxml_mime in _OOXML_MARKERS:
                        if marker in data_prefix:
                            mime = ooxml_mime
                            break
                add(mime, VERY_HIGH)
                sig_hit = True
                break
        if not sig_hit and data_prefix[257:262] == b"ustar":
            add("application/x-tar", VERY_HIGH)
            sig_hit = True
        # DICOM: 128-byte preamble + "DICM" (PS3.10 §7.1 — not a
        # plain prefix, so outside the _MAGIC table)
        if not sig_hit and data_prefix[128:132] == b"DICM":
            add("application/dicom", VERY_HIGH)
            sig_hit = True
        # WEBP: "RIFF" + 4 size bytes + "WEBP" (content_type_image.cpp:
        # 42-48 — not a plain prefix, so outside the _MAGIC table)
        if (
            not sig_hit
            and data_prefix[:4] == b"RIFF"
            and data_prefix[8:12] == b"WEBP"
        ):
            add("image/webp", VERY_HIGH)
            sig_hit = True
        if not sig_hit:
            head = data_prefix[:1024]
            hl = head.lstrip(b"\xef\xbb\xbf \t\r\n").lower()
            if hl.startswith(b"<?xml"):
                # flat-ODF refinement (content_type_odf_flat.cpp:17-37)
                flat = None
                if b"office:document" in data_prefix:
                    for marker, m in _ODF_FLAT_MARKERS:
                        if marker in data_prefix:
                            flat = m
                            break
                if flat:
                    add(flat, HIGHEST)
                else:
                    add("application/xml", VERY_HIGH)
            elif hl.startswith(b"<!doctype html") or hl.startswith(b"<html"):
                add("text/html", VERY_HIGH)
            elif hl.startswith(b"{") or hl.startswith(b"["):
                add("application/json" if _is_jsonish(head) else "text/plain", LOW)
            if not _looks_binary(data_prefix):
                add("text/plain", LOW)
            else:
                add("application/octet-stream", LOW)

    # 3. html refinement (HIGHEST) if mime is xml-ish/html-ish or empty
    xmlish_ok = not mimes or any(
        mimes.get(m, NONE) >= MEDIUM
        for m in ("text/xml", "application/xml", "text/html", "application/xhtml+xml")
    )
    if xmlish_ok:
        head = data_prefix[:1024]
        if b"<html" in head or b"<HTML" in head:
            add("text/html", HIGHEST)

    # 4. ASP refinement (content_type_asp.cpp:17-39): html-ish pages
    # with server-side tags become text/asp(.net) at HIGHEST — the
    # alphabetical tie-break then routes them to the TXT parser
    if not mimes or mimes.get("text/html", NONE) >= MEDIUM:
        head2k = data_prefix[:2048]
        if (
            b"<%@ Page" in head2k or b"<%@page" in head2k
            or b"<%@ Control" in head2k or b"<%@control" in head2k
            or b'runat="server"' in head2k or b"<%#" in head2k
        ):
            add("text/aspdotnet", HIGHEST)
        elif b"<%" in head2k or b"<!-- #include" in head2k:
            add("text/asp", HIGHEST)

    if not mimes:
        return ("application/octet-stream", LOW)
    # highest confidence wins; alphabetical tie-break (data_source.h:240-255)
    best_conf = max(mimes.values())
    best = sorted(m for m, c in mimes.items() if c == best_conf)[0]
    return (best, best_conf)


def _is_jsonish(head: bytes) -> bool:
    stripped = head.strip()
    return stripped[:1] in (b"{", b"[") and (b'"' in stripped or stripped in (b"{}", b"[]"))


CONFIDENCE_NAMES = {
    NONE: "none", LOW: "low", MEDIUM: "medium",
    HIGH: "high", VERY_HIGH: "very_high", HIGHEST: "highest",
}
