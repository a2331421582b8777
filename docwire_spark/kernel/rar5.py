"""Pure-Python RAR5 reader: archive walk + the RAR5 LZ+Huffman
decompressor (reference consumes rar via libarchive,
archives_parser.cpp:31-45; wire format per the published RARLAB 5.0
archive-format technote).

Supported: RAR5 signature, file headers (vint fields), store (method
0) and the general compressed methods (1-5 share one decoder: Huffman
tables over a 20-symbol pre-table, 306/64/16/44 main/distance/
low-distance/length alphabets, 4-slot recent-offset history, delta and
x86 post-filters).  Not supported: encrypted archives, solid
compression across files, RAR4 (0x00 flavor signature).
"""

from __future__ import annotations

import struct

SIG5 = b"Rar!\x1a\x07\x01\x00"
SIG4 = b"Rar!\x1a\x07\x00"

NC, DC, LDC, RC = 306, 64, 16, 44
BC = 20


class RarError(Exception):
    pass


#: decompression-bomb guard (ADVICE r2): unp_size is an
#: attacker-controlled vint, and the pure-Python decoder would grow
#: ``out`` until reaching it — a few-hundred-byte crafted archive
#: claiming a multi-GB size could OOM/CPU-spin an executor processing
#: untrusted crawl data.  Entries above the cap raise (surfacing as a
#: per-row error), matching the entry-count cap in archive_extract.
MAX_MEMBER_BYTES = 256 * 1024 * 1024


def _vint(b, i):
    r = 0
    shift = 0
    while True:
        if i >= len(b):
            raise RarError("truncated vint")
        x = b[i]
        i += 1
        r |= (x & 0x7F) << shift
        if not x & 0x80:
            return r, i
        shift += 7


# ---------------------------------------------------------------------------
# bit reader (MSB-first, as the RAR decoder consumes the stream)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("d", "addr", "bit")

    def __init__(self, d):
        self.d = d
        self.addr = 0
        self.bit = 0

    def fgetbits(self):
        d, a = self.d, self.addr
        b0 = d[a] if a < len(d) else 0
        b1 = d[a + 1] if a + 1 < len(d) else 0
        b2 = d[a + 2] if a + 2 < len(d) else 0
        v = (b0 << 16) | (b1 << 8) | b2
        return (v >> (8 - self.bit)) & 0xFFFF

    def faddbits(self, n):
        n += self.bit
        self.addr += n >> 3
        self.bit = n & 7

    def getbits32(self):
        d, a = self.d, self.addr
        v = 0
        for k in range(5):
            v = (v << 8) | (d[a + k] if a + k < len(d) else 0)
        return (v >> (8 - self.bit)) & 0xFFFFFFFF

    def align(self):
        if self.bit:
            self.addr += 1
            self.bit = 0


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------


class _Huff:
    """Canonical Huffman decoder from a bit-length array (the table
    layout unrar's MakeDecodeTables produces: codes assigned in
    (length, symbol-order))."""

    __slots__ = ("limits", "offsets", "symbols", "max_len", "first")

    def __init__(self, lengths):
        counts = [0] * 17
        for ln in lengths:
            if ln:
                counts[ln] += 1
        self.symbols = []
        for target in range(1, 17):
            for sym, ln in enumerate(lengths):
                if ln == target:
                    self.symbols.append(sym)
        self.first = [0] * 17    # first canonical code per length
        self.limits = [0] * 17   # first + count (first invalid code)
        self.offsets = [0] * 17  # symbol-array index per length
        idx = 0
        for ln in range(1, 17):
            if ln > 1:
                self.first[ln] = (self.first[ln - 1] + counts[ln - 1]) << 1
            self.limits[ln] = self.first[ln] + counts[ln]
            self.offsets[ln] = idx
            idx += counts[ln]
        self.max_len = max((ln for ln in lengths if ln), default=0)

    def decode(self, bits: _Bits):
        if self.max_len == 0:
            raise RarError("decode from empty table")
        v = bits.fgetbits()
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | ((v >> (16 - ln)) & 1)
            if code < self.limits[ln]:
                bits.faddbits(ln)
                return self.symbols[
                    self.offsets[ln] + (code - self.first[ln])
                ]
        raise RarError("bad Huffman code")


# ---------------------------------------------------------------------------
# RAR5 decompressor
# ---------------------------------------------------------------------------


class _Rar5Decoder:
    def __init__(self, data: bytes, unp_size: int):
        if unp_size > MAX_MEMBER_BYTES:  # defense in depth: iter_rar5
            # checks too, but the decoder is importable directly
            raise RarError(f"member too large ({unp_size} bytes)")
        self.bits = _Bits(data)
        self.out = bytearray()
        self.unp_size = unp_size
        self.old_dist = [0, 0, 0, 0]
        self.last_length = 0
        self.tables = None
        self.block_end_addr = 0
        self.block_end_bit = 0
        self.last_block = False
        self.filters = []

    # -- block & table headers -------------------------------------------
    def _read_block_header(self):
        self.bits.align()
        b = self.bits
        flags = b.fgetbits() >> 8
        b.faddbits(8)
        byte_count = ((flags >> 3) & 3) + 1
        if byte_count == 4:
            raise RarError("bad block header byte count")
        bit_size = (flags & 7) + 1
        saved_cksum = b.fgetbits() >> 8
        b.faddbits(8)
        block_size = 0
        for i in range(byte_count):
            block_size += (b.fgetbits() >> 8) << (i * 8)
            b.faddbits(8)
        cksum = 0x5A ^ flags ^ (block_size & 0xFF) ^ (
            (block_size >> 8) & 0xFF) ^ ((block_size >> 16) & 0xFF)
        if cksum & 0xFF != saved_cksum:
            raise RarError("block header checksum mismatch")
        self.block_end_addr = b.addr + block_size
        self.block_end_bit = bit_size
        self.last_block = bool(flags & 0x40)
        if flags & 0x80:
            self._read_tables()

    def _read_tables(self):
        b = self.bits
        bit_length = [0] * BC
        i = 0
        while i < BC:
            length = b.fgetbits() >> 12
            b.faddbits(4)
            if length == 15:
                zero_count = b.fgetbits() >> 12
                b.faddbits(4)
                if zero_count == 0:
                    bit_length[i] = 15
                    i += 1
                else:
                    for _ in range(zero_count + 2):
                        if i < BC:
                            bit_length[i] = 0
                            i += 1
            else:
                bit_length[i] = length
                i += 1
        bd = _Huff(bit_length)
        table = [0] * (NC + DC + LDC + RC)
        i = 0
        while i < len(table):
            num = bd.decode(b)
            if num < 16:
                table[i] = num
                i += 1
            elif num < 18:
                if num == 16:
                    n = (b.fgetbits() >> 13) + 3
                    b.faddbits(3)
                else:
                    n = (b.fgetbits() >> 9) + 11
                    b.faddbits(7)
                if i == 0:
                    raise RarError("table repeat at start")
                while n > 0 and i < len(table):
                    table[i] = table[i - 1]
                    i += 1
                    n -= 1
            else:
                if num == 18:
                    n = (b.fgetbits() >> 13) + 3
                    b.faddbits(3)
                else:
                    n = (b.fgetbits() >> 9) + 11
                    b.faddbits(7)
                while n > 0 and i < len(table):
                    table[i] = 0
                    i += 1
                    n -= 1
        self.tables = (
            _Huff(table[:NC]),
            _Huff(table[NC:NC + DC]),
            _Huff(table[NC + DC:NC + DC + LDC]),
            _Huff(table[NC + DC + LDC:]),
        )

    def _block_exhausted(self):
        b = self.bits
        if b.addr > self.block_end_addr - 1:
            return True
        if b.addr == self.block_end_addr - 1 and b.bit >= self.block_end_bit:
            return True
        return False

    # -- primitives --------------------------------------------------------
    def _slot_to_length(self, slot):
        b = self.bits
        length = 2
        if slot < 8:
            lbits = 0
            length += slot
        else:
            lbits = slot // 4 - 1
            length += (4 | (slot & 3)) << lbits
        if lbits > 0:
            length += self.bits.getbits32() >> (32 - lbits)
            b.faddbits(lbits)
        return length

    def _copy(self, length, dist):
        if dist == 0 or dist > len(self.out):
            raise RarError("bad LZ distance")
        out = self.out
        pos = len(out) - dist
        for _ in range(length):
            out.append(out[pos])
            pos += 1

    def _read_filter_data(self):
        b = self.bits
        byte_count = (b.fgetbits() >> 14) + 1
        b.faddbits(2)
        data = 0
        for i in range(byte_count):
            data += (b.fgetbits() >> 8) << (i * 8)
            b.faddbits(8)
        return data

    def _read_filter(self):
        start = self._read_filter_data() + len(self.out)
        length = self._read_filter_data()
        b = self.bits
        ftype = b.fgetbits() >> 13
        b.faddbits(3)
        channels = 0
        if ftype == 0:  # delta
            channels = (b.fgetbits() >> 11) + 1
            b.faddbits(5)
        self.filters.append((start, length, ftype, channels))

    def _apply_filters(self):
        out = self.out
        for start, length, ftype, channels in self.filters:
            if start + length > len(out) or length == 0:
                continue
            seg = out[start:start + length]
            if ftype == 0:  # delta: per-channel running sums
                res = bytearray(length)
                src = 0
                for ch in range(channels):
                    prev = 0
                    for pos in range(ch, length, channels):
                        prev = (prev - seg[src]) & 0xFF
                        res[pos] = prev
                        src += 1
                out[start:start + length] = res
            elif ftype in (1, 2):  # E8 / E8E9 x86 call-offset
                file_offset = start
                cmp_bytes = (0xE8,) if ftype == 1 else (0xE8, 0xE9)
                pos = 0
                while pos < length - 4:
                    if seg[pos] in cmp_bytes:
                        off = pos + 1
                        addr = struct.unpack_from("<i", seg, off)[0]
                        cur = file_offset + pos + 1
                        if addr < 0:
                            if addr + cur >= 0:
                                struct.pack_into(
                                    "<I", seg, off,
                                    (addr + 0x1000000) & 0xFFFFFFFF)
                        elif addr < 0x1000000:
                            struct.pack_into(
                                "<I", seg, off, (addr - cur) & 0xFFFFFFFF)
                        pos += 4
                    pos += 1
                out[start:start + length] = seg
            # ftype 3 (ARM) left unapplied: absent from office payloads
        self.filters = []

    # -- main loop ---------------------------------------------------------
    def run(self):
        self._read_block_header()
        while len(self.out) < self.unp_size:
            if self._block_exhausted():
                if self.last_block:
                    break
                self._read_block_header()
                continue
            if self.tables is None:
                raise RarError("no Huffman tables")
            ld, dd, ldd, rd = self.tables
            slot = ld.decode(self.bits)
            if slot < 256:
                self.out.append(slot)
            elif slot == 256:
                self._read_filter()
            elif slot == 257:
                if self.last_length:
                    self._copy(self.last_length, self.old_dist[0])
            elif slot < 262:
                idx = slot - 258
                dist = self.old_dist[idx]
                del self.old_dist[idx]
                self.old_dist.insert(0, dist)
                length = self._slot_to_length(rd.decode(self.bits))
                self.last_length = length
                self._copy(length, dist)
            else:
                length = self._slot_to_length(slot - 262)
                dist_slot = dd.decode(self.bits)
                dist = 1
                if dist_slot < 4:
                    dbits = 0
                    dist += dist_slot
                else:
                    dbits = dist_slot // 2 - 1
                    dist += (2 | (dist_slot & 1)) << dbits
                if dbits > 0:
                    if dbits >= 4:
                        if dbits > 4:
                            dist += (
                                (self.bits.getbits32() >> (36 - dbits)) << 4
                            )
                            self.bits.faddbits(dbits - 4)
                        dist += ldd.decode(self.bits)
                    else:
                        dist += self.bits.getbits32() >> (32 - dbits)
                        self.bits.faddbits(dbits)
                if dist > 0x100:
                    length += 1
                    if dist > 0x2000:
                        length += 1
                        if dist > 0x40000:
                            length += 1
                self.old_dist.pop()
                self.old_dist.insert(0, dist)
                self.last_length = length
                self._copy(length, dist)
        self._apply_filters()
        return bytes(self.out[:self.unp_size])


# ---------------------------------------------------------------------------
# archive walk
# ---------------------------------------------------------------------------


def iter_rar5(data: bytes):
    """Yield (name, payload_bytes) per file entry of a RAR5 archive."""
    if data[:len(SIG4)] == SIG4 and data[:len(SIG5)] != SIG5:
        raise RarError("RAR4 archives not supported")
    if data[:len(SIG5)] != SIG5:
        raise RarError("not a RAR5 archive")
    i = len(SIG5)
    while i + 7 <= len(data):
        j = i + 4  # skip header CRC
        hdr_size, j = _vint(data, j)
        hdr_start = j
        htype, j = _vint(data, j)
        flags, j = _vint(data, j)
        data_size = 0
        extra_size = 0
        if flags & 1:
            extra_size, j = _vint(data, j)
        if flags & 2:
            data_size, j = _vint(data, j)
        if htype == 5:  # end of archive
            break
        if htype == 4:  # archive encryption header: everything after
            # it is ciphertext (reference assert_not_encrypted)
            raise RarError("encrypted RAR5 archive")
        if htype == 2 or htype == 3:  # file / service header
            fflags, j = _vint(data, j)
            unp_size, j = _vint(data, j)
            _attr, j = _vint(data, j)
            if fflags & 2:
                j += 4  # mtime
            if fflags & 4:
                j += 4  # data CRC
            comp, j = _vint(data, j)
            _host, j = _vint(data, j)
            nlen, j = _vint(data, j)
            name = data[j:j + nlen].decode("utf-8", "replace")
            if extra_size:
                # extra area = last extra_size bytes of the header:
                # records are (size vint, type vint, data); type 0x01
                # = file encryption -> the payload is ciphertext
                k = hdr_start + hdr_size - extra_size
                area_end = hdr_start + hdr_size
                while k < area_end:
                    rec_size, k2 = _vint(data, k)
                    rec_type, _ = _vint(data, k2)
                    if rec_type == 0x01:
                        raise RarError(f"encrypted RAR5 entry: {name}")
                    k = k2 + rec_size  # size counts type + data
            payload = data[hdr_start + hdr_size:
                           hdr_start + hdr_size + data_size]
            if htype == 2 and not fflags & 1:  # skip directories
                if comp & 0x40:  # solid flag (bit 6)
                    raise RarError("solid RAR5 not supported")
                if unp_size > MAX_MEMBER_BYTES:
                    raise RarError(
                        f"member too large ({unp_size} bytes): {name}"
                    )
                method = (comp >> 7) & 7
                if method == 0:
                    yield name, bytes(payload)
                else:
                    yield name, _Rar5Decoder(payload, unp_size).run()
        i = hdr_start + hdr_size + data_size
    return
