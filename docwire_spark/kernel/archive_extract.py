"""Archive extraction: zip/tar/gz/bz2/xz entries through the pipeline.

Reference: src/archives_parser.cpp:208-263 — every non-directory entry
is re-emitted on the ``back`` channel with its file extension, so each
entry re-enters the WHOLE chain and renders as a complete standalone
document (the exporter sees sequential top-level documents; verified
tests/test.zip.out = concatenation of the entries' own .out
renderings).  If no entry parses, the archive is uninterpretable
(message_counters.all_failed, archives_parser.cpp:255-256).

rar5 via the own decoder in kernel/rar5.py; encrypted entries raise like
the reference's assert_not_encrypted.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import tarfile
import zipfile

ARCHIVE_MIMES = frozenset(
    (
        "application/zip",
        "application/x-tar",
        "application/gzip",
        "application/x-bzip2",
        "application/x-xz",
        "application/vnd.rar",
    )
)

MAX_DEPTH = 8  # nested-archive recursion cap (zip-bomb guard)
MAX_ENTRIES = 10_000


class ArchiveError(Exception):
    pass


def iter_entries(data: bytes, mime: str, url: str = ""):
    """Yield (name, bytes) for each non-directory entry."""
    if mime == "application/zip":
        zf = zipfile.ZipFile(io.BytesIO(data))
        n = 0
        for info in zf.infolist():
            if info.is_dir():
                continue
            if info.flag_bits & 0x1:
                raise ArchiveError(f"encrypted entry: {info.filename}")
            n += 1
            if n > MAX_ENTRIES:
                raise ArchiveError("too many archive entries")
            yield info.filename, zf.read(info)
    elif mime == "application/vnd.rar":
        from docwire_spark.kernel.rar5 import iter_rar5

        n = 0
        for name, payload in iter_rar5(data):
            n += 1
            if n > MAX_ENTRIES:
                raise ArchiveError("too many archive entries")
            yield name, payload
    elif mime == "application/x-tar":
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
        n = 0
        for member in tf:
            if not member.isfile():
                continue
            n += 1
            if n > MAX_ENTRIES:
                raise ArchiveError("too many archive entries")
            f = tf.extractfile(member)
            yield member.name, f.read() if f else b""
    else:
        # single-member compressors: payload keeps the stripped name
        decomp = {
            "application/gzip": gzip.decompress,
            "application/x-bzip2": bz2.decompress,
            "application/x-xz": lzma.decompress,
        }[mime]
        name = url.rsplit("/", 1)[-1]
        for suffix in (".gz", ".bz2", ".xz", ".tgz", ".tbz2", ".txz"):
            if name.lower().endswith(suffix):
                name = (
                    name[: -len(suffix)]
                    + (".tar" if suffix in (".tgz", ".tbz2", ".txz") else "")
                )
                break
        yield name, decomp(data)
