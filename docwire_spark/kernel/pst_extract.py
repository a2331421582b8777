"""Unicode PST (Outlook data file) reader — NDB + LTP + messaging
layers (reference: src/pst_parser.cpp via libpff; wire format per the
public MS-PST specification).

Layers implemented:
- NDB: header, node/block BTrees, permute decryption
  (NDB_CRYPT_PERMUTE), XBLOCK data trees, SL/SI subnode trees
- LTP: heap-on-node (HN), BTree-on-heap (BTH), property contexts
  (PC), table contexts (TC; rows enumerated via the row-index BTH,
  whose ascending dwRowID order is the enumeration order libpff's
  output exhibits)
- messaging: folder hierarchy walk, messages (subject — the
  \x01\x01 control prefix stays, as in the goldens — creation time, HTML body), attachments (short
  filename + payload), each body/attachment re-entering the
  extraction chain through the back-channel

The NDB_CRYPT_PERMUTE table: round 2 recovered ~200 decode entries
from the reference fixture by known-plaintext analysis; round 3
completed the table from the public MS-PST specification §5.1
("Permutative Encoding", the mpbbCrypt constant, reproduced in every
open PST implementation).  Cross-validation: 199 of the 200 recovered
entries agree with the spec constant; the one disagreement (cipher
byte 0x7B, recovered from weaker structural evidence, off by a single
bit) is corrected by the spec table, and both 1.pst goldens remain
byte-identical.  Decryption is a single ``bytes.translate`` — no
per-byte Python.

Both PST generations are handled: Unicode (wVer >= 23; 64-bit BIDs/
IBs) and ANSI (wVer 14/15; 32-bit BIDs/IBs, shifted header/ROOT
offsets, narrower BTree/XBLOCK/SL-SI entry layouts per MS-PST §2).
The LTP and messaging layers are format-identical across generations.
"""

from __future__ import annotations

import struct
import time as _time

from docwire_spark.kernel import events as E

MAGIC = b"!BDN"

#: MS-PST §5.1 mpbbCrypt, encode direction (plain -> cipher).
PERMUTE_E = [
    0x41, 0x36, 0x13, 0x62, 0xa8, 0x21, 0x6e, 0xbb, 0xf4, 0x16, 0xcc, 0x04, 0x7f, 0x64, 0xe8, 0x5d,
    0x1e, 0xf2, 0xcb, 0x2a, 0x74, 0xc5, 0x5e, 0x35, 0xd2, 0x95, 0x47, 0x9e, 0x96, 0x2d, 0x9a, 0x88,
    0x4c, 0x7d, 0x84, 0x3f, 0xdb, 0xac, 0x31, 0xb6, 0x48, 0x5f, 0xf6, 0xc4, 0xd8, 0x39, 0x8b, 0xe7,
    0x23, 0x3b, 0x38, 0x8e, 0xc8, 0xc1, 0xdf, 0x25, 0xb1, 0x20, 0xa5, 0x46, 0x60, 0x4e, 0x9c, 0xfb,
    0xaa, 0xd3, 0x56, 0x51, 0x45, 0x7c, 0x55, 0x00, 0x07, 0xc9, 0x2b, 0x9d, 0x85, 0x9b, 0x09, 0xa0,
    0x8f, 0xad, 0xb3, 0x0f, 0x63, 0xab, 0x89, 0x4b, 0xd7, 0xa7, 0x15, 0x5a, 0x71, 0x66, 0x42, 0xbf,
    0x26, 0x4a, 0x6b, 0x98, 0xfa, 0xea, 0x77, 0x53, 0xb2, 0x70, 0x05, 0x2c, 0xfd, 0x59, 0x3a, 0x86,
    0x7e, 0xce, 0x06, 0xeb, 0x82, 0x78, 0x57, 0xc7, 0x8d, 0x43, 0xaf, 0xb4, 0x1c, 0xd4, 0x5b, 0xcd,
    0xe2, 0xe9, 0x27, 0x4f, 0xc3, 0x08, 0x72, 0x80, 0xcf, 0xb0, 0xef, 0xf5, 0x28, 0x6d, 0xbe, 0x30,
    0x4d, 0x34, 0x92, 0xd5, 0x0e, 0x3c, 0x22, 0x32, 0xe5, 0xe4, 0xf9, 0x9f, 0xc2, 0xd1, 0x0a, 0x81,
    0x12, 0xe1, 0xee, 0x91, 0x83, 0x76, 0xe3, 0x97, 0xe6, 0x61, 0x8a, 0x17, 0x79, 0xa4, 0xb7, 0xdc,
    0x90, 0x7a, 0x5c, 0x8c, 0x02, 0xa6, 0xca, 0x69, 0xde, 0x50, 0x1a, 0x11, 0x93, 0xb9, 0x52, 0x87,
    0x58, 0xfc, 0xed, 0x1d, 0x37, 0x49, 0x1b, 0x6a, 0xe0, 0x29, 0x33, 0x99, 0xbd, 0x6c, 0xd9, 0x94,
    0xf3, 0x40, 0x54, 0x6f, 0xf0, 0xc6, 0x73, 0xb8, 0xd6, 0x3e, 0x65, 0x18, 0x44, 0x1f, 0xdd, 0x67,
    0x10, 0xf1, 0x0c, 0x19, 0xec, 0xae, 0x03, 0xa1, 0x14, 0x7b, 0xa9, 0x0b, 0xff, 0xf8, 0xa3, 0xc0,
    0xa2, 0x01, 0xf7, 0x2e, 0xbc, 0x24, 0x68, 0x75, 0x0d, 0xfe, 0xba, 0x2f, 0xb5, 0xd0, 0xda, 0x3d,
]

#: Decode direction (cipher -> plain) — the inverse permutation.
PERMUTE_D = [0] * 256
for _p, _c in enumerate(PERMUTE_E):
    PERMUTE_D[_c] = _p

_DECODE_TR = bytes(PERMUTE_D)
_ENCODE_TR = bytes(PERMUTE_E)



class PstError(ValueError):
    pass


class _Blk:
    """Decrypted block bytes + the set of undecryptable offsets."""

    __slots__ = ("b", "holes", "bid")

    def __init__(self, b, holes, bid):
        self.b = b
        self.holes = holes
        self.bid = bid

    def chk(self, lo, hi):
        if self.holes and any(lo <= h < hi for h in self.holes):
            raise PstError(
                f"undecryptable byte in block {self.bid:#x}"
                f" range [{lo:#x},{hi:#x})"
            )

    def u8(self, off):
        self.chk(off, off + 1)
        return self.b[off]

    def u16(self, off):
        self.chk(off, off + 2)
        return struct.unpack_from("<H", self.b, off)[0]

    def u32(self, off):
        self.chk(off, off + 4)
        return struct.unpack_from("<I", self.b, off)[0]

    def u64(self, off):
        self.chk(off, off + 8)
        return struct.unpack_from("<Q", self.b, off)[0]

    def __len__(self):
        return len(self.b)


class Pst:
    def __init__(self, data: bytes):
        if data[:4] != MAGIC:
            raise PstError("not a PST (missing !BDN magic)")
        wVer = struct.unpack_from("<H", data, 10)[0] if len(data) >= 12 \
            else 0
        self.ansi = wVer in (14, 15)
        if not self.ansi and wVer < 23:
            raise PstError(f"unknown PST version {wVer}")
        if len(data) < (512 if self.ansi else 564):
            raise PstError("truncated PST header")
        self.data = data
        self.nbt = {}
        self.bbt = {}
        if self.ansi:
            # MS-PST §2.2.2.6: ANSI HEADER — ROOT at 164, BREFs are
            # (bid u32, ib u32): BREFNBT at 184 (ib at 188), BREFBBT
            # at 192 (ib at 196); bCryptMethod at 461
            self.crypt = data[461]
            ibNBT = struct.unpack_from("<I", data, 188)[0]
            ibBBT = struct.unpack_from("<I", data, 196)[0]
        else:
            self.crypt = data[0x201]
            _, ibNBT = struct.unpack_from("<QQ", data, 216)
            _, ibBBT = struct.unpack_from("<QQ", data, 232)
        self._read_btree(ibNBT, True)
        self._read_btree(ibBBT, False)
        self._sub_cache = {}

    def _read_btree(self, ib, is_nbt, depth=0):
        if depth > 8:
            raise PstError("BTree too deep")
        page = self.data[ib:ib + 512]
        if len(page) < 512:
            raise PstError("truncated BTree page")
        # BTPAGE metadata: Unicode at 488 (rgentries 488 bytes), ANSI
        # at 496 (rgentries 496 bytes)
        meta = 496 if self.ansi else 488
        cEnt, _, cbEnt, cLevel = (
            page[meta], page[meta + 1], page[meta + 2], page[meta + 3]
        )
        if cbEnt == 0 or cEnt * cbEnt > meta:
            raise PstError("bad BTree page geometry")
        for k in range(cEnt):
            e = page[k * cbEnt:(k + 1) * cbEnt]
            if cLevel > 0:
                if self.ansi:   # BTENTRY: btkey u32, BREF(bid u32, ib u32)
                    ib2 = struct.unpack_from("<I", e, 8)[0]
                else:           # btkey u64, BREF(bid u64, ib u64)
                    ib2 = struct.unpack_from("<Q", e, 16)[0]
                self._read_btree(ib2, is_nbt, depth + 1)
            elif is_nbt:
                if self.ansi:   # NBTENTRY: nid/bidData/bidSub/nidParent u32
                    nid, bd, bs, _par = struct.unpack_from("<IIII", e, 0)
                else:
                    nid, bd, bs, _par = struct.unpack_from("<QQQI", e, 0)
                self.nbt[nid & 0xFFFFFFFF] = (bd, bs)
            else:
                if self.ansi:   # BBTENTRY: BREF(bid u32, ib u32), cb, cRef
                    bid, ib2, cb = struct.unpack_from("<IIH", e, 0)
                else:
                    bid, ib2 = struct.unpack_from("<QQ", e, 0)
                    cb = struct.unpack_from("<H", e, 16)[0]
                self.bbt[bid] = (ib2, cb)

    def block(self, bid):
        if bid not in self.bbt:
            raise PstError(f"unknown bid {bid:#x}")
        ib, cb = self.bbt[bid]
        raw = self.data[ib:ib + cb]
        if len(raw) < cb:
            raise PstError("truncated block")
        if bid & 2 or self.crypt == 0:
            return _Blk(raw, frozenset(), bid)
        if self.crypt != 1:
            raise PstError(f"unsupported crypt method {self.crypt}")
        return _Blk(raw.translate(_DECODE_TR), frozenset(), bid)

    def data_blocks(self, bid, depth=0):
        if depth > 4:
            raise PstError("data tree too deep")
        if bid == 0:
            return []
        blk = self.block(bid)
        if not bid & 2:
            return [blk]
        if blk.u8(0) != 1:
            raise PstError(f"expected XBLOCK in data tree of {bid:#x}")
        out = []
        for k in range(blk.u16(2)):
            # XBLOCK rgbid at 8: u64 stride in Unicode, u32 in ANSI
            child = blk.u32(8 + 4 * k) if self.ansi else blk.u64(8 + 8 * k)
            out.extend(self.data_blocks(child, depth + 1))
        return out

    def data_bytes(self, bid):
        parts = []
        for blk in self.data_blocks(bid):
            blk.chk(0, len(blk))
            parts.append(blk.b)
        return b"".join(parts)

    def subnodes(self, bid_sub):
        if bid_sub == 0:
            return {}
        if bid_sub in self._sub_cache:
            return self._sub_cache[bid_sub]
        out = {}

        def walk(bid, depth=0):
            if depth > 8:
                raise PstError("subnode tree too deep")
            blk = self.block(bid)
            if blk.u8(0) != 2:
                raise PstError("expected SL/SI block")
            cEnt = blk.u16(2)
            if blk.u8(1) == 0:
                if self.ansi:   # SLENTRY u32 x3 at 4 (no dwPadding)
                    for k in range(cEnt):
                        nid = blk.u32(4 + 12 * k)
                        out[nid] = (blk.u32(4 + 12 * k + 4),
                                    blk.u32(4 + 12 * k + 8))
                else:           # SLENTRY u64 x3 at 8
                    for k in range(cEnt):
                        nid = blk.u64(8 + 24 * k) & 0xFFFFFFFF
                        out[nid] = (blk.u64(8 + 24 * k + 8),
                                    blk.u64(8 + 24 * k + 16))
            else:
                if self.ansi:   # SIENTRY (nid u32, bid u32) at 4
                    for k in range(cEnt):
                        walk(blk.u32(4 + 8 * k + 4), depth + 1)
                else:           # SIENTRY (nid u64, bid u64) at 8
                    for k in range(cEnt):
                        walk(blk.u64(8 + 16 * k + 8), depth + 1)

        walk(bid_sub)
        self._sub_cache[bid_sub] = out
        return out


class _Heap:
    def __init__(self, pst, bid):
        self.blocks = pst.data_blocks(bid)
        if not self.blocks:
            raise PstError("empty heap node")
        hdr = self.blocks[0]
        if hdr.u8(2) != 0xEC:
            raise PstError("bad HN signature")
        self.client_sig = hdr.u8(3)
        self.user_root = hdr.u32(4)

    def item(self, hid):
        idx = (hid >> 5) & 0x7FF
        blk_i = hid >> 16
        if idx == 0 or blk_i >= len(self.blocks):
            return _Blk(b"", frozenset(), -1)
        b = self.blocks[blk_i]
        ibHnpm = b.u16(0)
        lo = b.u16(ibHnpm + 4 + 2 * (idx - 1))
        hi = b.u16(ibHnpm + 4 + 2 * idx)
        if not (0 <= lo <= hi <= len(b)):
            raise PstError("bad heap allocation")
        return _Blk(b.b[lo:hi],
                    frozenset(h - lo for h in b.holes if lo <= h < hi),
                    b.bid)


def _bth_records(heap, bth_hid):
    hdr = heap.item(bth_hid)
    if len(hdr) == 0:
        return
    if hdr.u8(0) != 0xB5:
        raise PstError("bad BTH signature")
    cbKey, cbEnt, levels = hdr.u8(1), hdr.u8(2), hdr.u8(3)
    root = hdr.u32(4)
    if root == 0:
        return

    def walk(hid, level):
        b = heap.item(hid)
        if level > 0:
            rec = cbKey + 4
            for k in range(len(b) // rec):
                yield from walk(b.u32(k * rec + cbKey), level - 1)
        else:
            rec = cbKey + cbEnt
            for k in range(len(b) // rec):
                yield b, k * rec, cbKey

    yield from walk(root, levels)


class PC:
    """Property context over (data block, subnode tree)."""

    def __init__(self, pst, bid, bid_sub):
        self.pst = pst
        self.heap = _Heap(pst, bid)
        self.subs = pst.subnodes(bid_sub)
        if self.client_sig != 0xBC:
            raise PstError("node is not a property context")
        self.props = {}
        for b, off, cbKey in _bth_records(self.heap, self.heap.user_root):
            try:
                self.props[b.u16(off)] = (b.u16(off + cbKey), b,
                                          off + cbKey + 2)
            except PstError:
                # record sits on an unrecovered table byte: skip — a
                # CONSUMED property would still fail loudly at get()
                continue

    @property
    def client_sig(self):
        return self.heap.client_sig

    def _hnid_bytes(self, hnid):
        if hnid == 0:
            return b""
        if hnid & 0x1F == 0:
            item = self.heap.item(hnid)
            item.chk(0, len(item))
            return item.b
        if hnid not in self.subs:
            raise PstError(f"missing subnode {hnid:#x}")
        return self.pst.data_bytes(self.subs[hnid][0])

    def get(self, propid):
        """Decoded value or None when absent (PT_LONG/BOOLEAN inline;
        strings/binary/SYSTIME via HNID)."""
        if propid not in self.props:
            return None
        ptype, b, voff = self.props[propid]
        if ptype == 0x0003:
            return b.u32(voff)
        if ptype == 0x000B:
            return bool(b.u8(voff))
        if ptype == 0x001F:
            return self._hnid_bytes(b.u32(voff)).decode("utf-16-le",
                                                        "replace")
        if ptype == 0x001E:
            return self._hnid_bytes(b.u32(voff)).decode("cp1252", "replace")
        if ptype == 0x0102:
            return self._hnid_bytes(b.u32(voff))
        if ptype == 0x0040:  # PT_SYSTIME -> unix seconds (truncating,
            raw = self._hnid_bytes(b.u32(voff))  # pst_parser.cpp:198-206)
            if len(raw) >= 8:
                ft = struct.unpack("<Q", raw[:8])[0]
                return ft // 10000000 - 11644473600
            return None
        return b.u32(voff)


class TC:
    """Table context: row nids via the row-index BTH (ascending)."""

    def __init__(self, pst, bid, bid_sub):
        self.pst = pst
        self.heap = _Heap(pst, bid)
        self.subs = pst.subnodes(bid_sub)
        if self.heap.client_sig != 0x7C:
            raise PstError("node is not a table context")
        info = self.heap.item(self.heap.user_root)
        if info.u8(0) != 0x7C:
            raise PstError("bad TCINFO")
        self.hidRowIndex = info.u32(10)
        self.hnidRows = info.u32(14)

    def row_nids(self):
        if self.hnidRows == 0:
            return []
        out = []
        for b, off, _cbKey in _bth_records(self.heap, self.hidRowIndex):
            out.append(b.u32(off))
        return sorted(out)


NID_ROOT_FOLDER = 0x122

# MAPI property ids consumed by the walk
PR_SUBJECT = 0x0037
PR_CREATION_TIME = 0x3007
PR_HTML = 0x1013
PR_DISPLAY_NAME = 0x3001
PR_ATTACH_FILENAME = 0x3704       # short 8.3 filename
PR_ATTACH_DATA = 0x3701
NID_ATTACHMENT_TABLE = 0x671


def _folder_table_nids(pst, folder_nid, kind):
    tnid = (folder_nid & ~0x1F) | kind
    ent = pst.nbt.get(tnid)
    if not ent or not ent[0]:
        return []
    return TC(pst, ent[0], ent[1]).row_nids()


def _walk_folder(pst, nid, depth, events, parse_child,
                 mail_min_creation_time=None):
    for sub in _folder_table_nids(pst, nid, 0x0D):
        if sub not in pst.nbt:
            continue
        pc = PC(pst, *pst.nbt[sub])
        events.append((E.FOLDER, (pc.get(PR_DISPLAY_NAME) or "", depth)))
        _walk_folder(pst, sub, depth + 1, events, parse_child,
                     mail_min_creation_time)
        events.append((E.CLOSE_FOLDER, None))
    for msg in _folder_table_nids(pst, nid, 0x0E):
        if msg not in pst.nbt:
            continue
        bd, bs = pst.nbt[msg]
        pc = PC(pst, bd, bs)
        ctime = pc.get(PR_CREATION_TIME)
        if mail_min_creation_time is not None and (
            ctime is None or ctime < mail_min_creation_time
        ):
            # standard_filter::filterByMailMinCreationTime skips the
            # whole message — body, attachments AND close_mail
            # (reference pst_parser.cpp: `continue` on skip).  Checked
            # before the body branch so a body-less message cannot
            # bypass the filter (ADVICE r2).
            continue
        html = pc.get(PR_HTML)
        opened_mail = html is not None
        if opened_mail:
            # prefix-coded subjects keep their \x01\x01 control
            # prefix: the reference golden contains it verbatim
            # (libpff returns the stored value unmodified)
            subject = pc.get(PR_SUBJECT) or ""
            events.append((E.MAIL, (subject, ctime, depth)))
            events.append((E.MAIL_BODY, None))
            events.extend(parse_child(bytes(html), "text/html"))
            events.append((E.CLOSE_MAIL_BODY, None))
        subs = pst.subnodes(bs)
        if NID_ATTACHMENT_TABLE in subs:
            for anid in TC(pst, *subs[NID_ATTACHMENT_TABLE]).row_nids():
                if anid not in subs:
                    continue
                apc = PC(pst, *subs[anid])
                name = apc.get(PR_ATTACH_FILENAME) or ""
                events.append((E.ATTACHMENT, name))
                data = apc.get(PR_ATTACH_DATA)
                if isinstance(data, (bytes, bytearray)):
                    E.offer_child(name, data)
                    tok = E.CHILD_SINK.set(None)
                    try:
                        events.extend(parse_child(bytes(data), None))
                    finally:
                        E.CHILD_SINK.reset(tok)
                events.append((E.CLOSE_ATTACHMENT, None))
        if opened_mail:
            events.append((E.CLOSE_MAIL, None))


def pst_to_events(data: bytes, parse_child, mail_min_creation_time=None):
    """Walk the PST messaging layer into renderer events; bodies and
    attachments re-enter the chain via parse_child (reference
    pst_parser.cpp:363-427 parse_internal).  ``mail_min_creation_time``
    implements standard_filter::filterByMailMinCreationTime
    (standard_filter.cpp:57-66): html-bearing messages created before
    the unix-seconds threshold are skipped entirely."""
    pst = Pst(data)
    events = [(E.DOCUMENT, None)]
    _walk_folder(pst, NID_ROOT_FOLDER, 0, events, parse_child,
                 mail_min_creation_time)
    events.append((E.CLOSE_DOCUMENT, None))
    return events, {}
