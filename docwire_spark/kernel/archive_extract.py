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
#: per-member decompressed-size cap (bomb guard, ADVICE r2) — matches
#: rar5.MAX_MEMBER_BYTES; oversized members raise, surfacing as a
#: per-row error instead of an executor OOM
MAX_MEMBER_BYTES = 256 * 1024 * 1024


class ArchiveError(Exception):
    pass


def _bounded_decompress(make_decompressor, data: bytes) -> bytes:
    """Decompress with a hard output cap (gzip/bz2/xz carry no
    trustworthy size up front): max_length keeps the cap enforced
    before the bytes materialize.  Concatenated multi-member streams
    (pigz/bgzip-style .gz, multi-stream .bz2/.xz) are drained member
    by member via ``unused_data``, and a stream that ends before its
    terminator raises instead of silently yielding a prefix."""
    out = []
    total = 0
    remaining = data
    while True:
        d = make_decompressor()
        feed = remaining
        while not d.eof:
            chunk = d.decompress(feed, MAX_MEMBER_BYTES + 1 - total)
            total += len(chunk)
            if total > MAX_MEMBER_BYTES:
                raise ArchiveError("decompressed member too large")
            if chunk:
                out.append(chunk)
            if d.eof:
                break
            tail = getattr(d, "unconsumed_tail", None)
            if tail is not None:  # zlib withholds input here on max_length
                if tail:
                    feed = tail
                    continue
                raise ArchiveError("truncated compressed stream")
            if d.needs_input:  # bz2/lzma buffer input internally
                raise ArchiveError("truncated compressed stream")
            feed = b""
        # gzip tooling pads the final member with NULs; anything else
        # after the terminator must parse as another member (or the
        # next decompressor raises, surfacing as a per-row error).
        remaining = d.unused_data.lstrip(b"\x00")
        if not remaining:
            return b"".join(out)


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
            if info.file_size > MAX_MEMBER_BYTES:
                raise ArchiveError(
                    f"member too large: {info.filename}"
                )
            with zf.open(info) as f:
                # declared file_size can lie: bounded read, then probe
                payload = f.read(MAX_MEMBER_BYTES + 1)
            if len(payload) > MAX_MEMBER_BYTES:
                raise ArchiveError(f"member too large: {info.filename}")
            yield info.filename, payload
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
            if member.size > MAX_MEMBER_BYTES:
                raise ArchiveError(f"member too large: {member.name}")
            f = tf.extractfile(member)
            yield member.name, f.read() if f else b""
    else:
        # single-member compressors: payload keeps the stripped name;
        # output bounded (the container states no reliable size)
        import functools
        import zlib

        decomp = {
            "application/gzip": functools.partial(
                _bounded_decompress,
                functools.partial(zlib.decompressobj, 31),
            ),
            "application/x-bzip2": functools.partial(
                _bounded_decompress, bz2.BZ2Decompressor
            ),
            "application/x-xz": functools.partial(
                _bounded_decompress, lzma.LZMADecompressor
            ),
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
