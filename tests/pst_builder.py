"""Minimal ANSI-PST writer (test fixture builder).

Emits a structurally-valid ANSI (wVer 15) PST per the public MS-PST
spec: header + ROOT, single-leaf NBT/BBT pages, heap-on-node blocks
with BTree-on-heap property/table contexts, an SL subnode block, and
NDB_CRYPT_PERMUTE encryption of data blocks — enough surface to
exercise every ANSI branch of docwire_spark.kernel.pst_extract.

The content modeled: root folder -> subfolder ("Inbox") containing one
message (subject, creation time, HTML body) with one attachment.
"""

from __future__ import annotations

import struct

from docwire_spark.kernel.pst_extract import _ENCODE_TR

NID_ROOT = 0x122
NID_FOLDER = 0x142          # type 2 (normal folder)
NID_MESSAGE = 0x164         # type 4 (normal message)
NID_ATTACH_TABLE = 0x671
NID_ATTACH_PC = 0x8028


def _heap_block(items, client_sig, user_root_idx=1):
    """HNHDR + items + HNPAGEMAP; item i (1-based) gets hid i<<5."""
    data = bytearray()
    data += struct.pack("<HBBI", 0, 0xEC, client_sig, user_root_idx << 5)
    data += b"\x00\x00\x00\x00"  # rgbFillLevel
    offs = [len(data)]
    for it in items:
        data += it
        offs.append(len(data))
    ib_hnpm = len(data)
    data[0:2] = struct.pack("<H", ib_hnpm)
    data += struct.pack("<HH", len(items), 0)
    data += b"".join(struct.pack("<H", o) for o in offs)
    return bytes(data)


def _bth_header(cb_key, cb_ent, root_idx):
    return struct.pack("<BBBBI", 0xB5, cb_key, cb_ent, 0, root_idx << 5)


def _pc_block(props):
    """props: {propid: (ptype, value)} — value is int (inline) or
    bytes (stored as a heap item referenced by HID)."""
    value_items = []
    recs = b""
    for propid in sorted(props):
        ptype, val = props[propid]
        if isinstance(val, int):
            dword = val & 0xFFFFFFFF
        else:
            value_items.append(val)
            dword = (2 + len(value_items)) << 5  # after header+records
        recs += struct.pack("<HHI", propid, ptype, dword)
    items = [_bth_header(2, 6, 2), recs] + value_items
    return _heap_block(items, 0xBC)


def _tc_block(row_nids):
    """TC whose row-index BTH yields row_nids (sorted ascending)."""
    tcinfo = struct.pack(
        "<BB4H", 0x7C, 1, 8, 8, 8, 8
    ) + struct.pack("<II", 2 << 5, 4 << 5) + b"\x00" * 8
    rows = b"".join(
        struct.pack("<II", nid, i) for i, nid in enumerate(sorted(row_nids))
    )
    items = [tcinfo, _bth_header(4, 4, 3), rows, b"\x00" * 8]
    return _heap_block(items, 0x7C)


def _sl_block(entries):
    """entries: {nid: (bid_data, bid_sub)} -> ANSI SLBLOCK."""
    out = struct.pack("<BBH", 2, 0, len(entries))
    for nid in sorted(entries):
        bd, bs = entries[nid]
        out += struct.pack("<III", nid, bd, bs)
    return out


def _utf16(s):
    return s.encode("utf-16-le")


def _filetime(unix_seconds):
    return struct.pack("<Q", (unix_seconds + 11644473600) * 10_000_000)


def build_ansi_pst(
    folder_name="Inbox",
    subject="hello ansi",
    body_html=b"<html><body><p>ansi body</p></body></html>",
    creation_unix=1_700_000_000,
    attach_name="note.txt",
    attach_data=b"attachment text",
    crypt=1,
):
    PR_SUBJECT, PR_CREATION = 0x0037, 0x3007
    PR_HTML, PR_DISPLAY = 0x1013, 0x3001
    PR_AFILE, PR_ADATA = 0x3704, 0x3701

    blocks = {}      # bid -> payload (pre-encryption)
    next_bid = [4]

    def add(payload, internal=False):
        bid = next_bid[0] | (2 if internal else 0)
        next_bid[0] += 4
        blocks[bid] = payload
        return bid

    bid_attach_pc = add(_pc_block({
        PR_AFILE: (0x001F, _utf16(attach_name)),
        PR_ADATA: (0x0102, attach_data),
    }))
    bid_attach_tc = add(_tc_block([NID_ATTACH_PC]))
    bid_msg_sl = add(_sl_block({
        NID_ATTACH_TABLE: (bid_attach_tc, 0),
        NID_ATTACH_PC: (bid_attach_pc, 0),
    }), internal=True)
    bid_msg_pc = add(_pc_block({
        PR_SUBJECT: (0x001F, _utf16(subject)),
        PR_CREATION: (0x0040, _filetime(creation_unix)),
        PR_HTML: (0x0102, body_html),
    }))
    bid_folder_pc = add(_pc_block({
        PR_DISPLAY: (0x001F, _utf16(folder_name)),
    }))
    bid_contents_tc = add(_tc_block([NID_MESSAGE]))
    bid_hier_tc = add(_tc_block([NID_FOLDER]))

    nbt = {
        (NID_ROOT & ~0x1F) | 0x0D: (bid_hier_tc, 0),
        NID_FOLDER: (bid_folder_pc, 0),
        (NID_FOLDER & ~0x1F) | 0x0E: (bid_contents_tc, 0),
        NID_MESSAGE: (bid_msg_pc, bid_msg_sl),
    }

    # ---- file assembly -------------------------------------------------
    out = bytearray(512)            # ANSI header placeholder
    bbt_entries = []                # (bid, ib, cb)
    for bid in sorted(blocks):
        payload = blocks[bid]
        if crypt == 1 and not (bid & 2):
            payload = payload.translate(_ENCODE_TR)
        ib = len(out)
        out += payload
        bbt_entries.append((bid, ib, len(payload)))

    def _leaf_page(entries, cb_ent):
        page = bytearray(512)
        for k, e in enumerate(entries):
            page[k * cb_ent:(k + 1) * cb_ent] = e
        page[496] = len(entries)
        page[497] = 496 // cb_ent
        page[498] = cb_ent
        page[499] = 0               # cLevel: leaf
        return bytes(page)

    ib_nbt = len(out)
    out += _leaf_page(
        [struct.pack("<IIII", nid, bd, bs, 0)
         for nid, (bd, bs) in sorted(nbt.items())], 16)
    ib_bbt = len(out)
    out += _leaf_page(
        [struct.pack("<IIHH", bid, ib, cb, 1)
         for bid, ib, cb in bbt_entries], 12)

    hdr = out
    hdr[0:4] = b"!BDN"
    struct.pack_into("<H", hdr, 10, 15)          # wVer: ANSI
    struct.pack_into("<I", hdr, 168, len(out))   # ROOT.ibFileEof
    struct.pack_into("<II", hdr, 184, 1, ib_nbt)  # BREFNBT
    struct.pack_into("<II", hdr, 192, 2, ib_bbt)  # BREFBBT
    hdr[461] = crypt                             # bCryptMethod
    return bytes(out)


def build_ansi_pst_multi(folders, crypt=1):
    """General ANSI-PST builder: ``folders`` is a list of
    (folder_name, messages) with messages =
    [(subject, creation_unix, body_html_or_None, attachments)], and
    attachments = [(name, data)].  Exercises multi-folder walks,
    body-less messages, multi-attachment tables."""
    PR_SUBJECT, PR_CREATION = 0x0037, 0x3007
    PR_HTML, PR_DISPLAY = 0x1013, 0x3001
    PR_AFILE, PR_ADATA = 0x3704, 0x3701

    blocks = {}
    next_bid = [4]

    def add(payload, internal=False):
        bid = next_bid[0] | (2 if internal else 0)
        next_bid[0] += 4
        blocks[bid] = payload
        return bid

    nbt = {}
    folder_nids = []
    next_msg_nid = [0x164]
    for fi, (fname, messages) in enumerate(folders):
        fnid = 0x142 + 0x40 * fi
        folder_nids.append(fnid)
        nbt[fnid] = (add(_pc_block({PR_DISPLAY: (0x001F, _utf16(fname))})), 0)
        msg_nids = []
        for subject, ctime, html, atts in messages:
            mnid = next_msg_nid[0]
            next_msg_nid[0] += 0x40
            msg_nids.append(mnid)
            props = {PR_SUBJECT: (0x001F, _utf16(subject)),
                     PR_CREATION: (0x0040, _filetime(ctime))}
            if html is not None:
                props[PR_HTML] = (0x0102, html)
            bid_pc = add(_pc_block(props))
            bid_sub = 0
            if atts:
                sl = {}
                att_nids = []
                for ai, (aname, adata) in enumerate(atts):
                    anid = 0x8028 + 0x40 * ai
                    att_nids.append(anid)
                    if len(adata) > 2000:
                        # big payload: chunked data blocks under an
                        # XBLOCK, referenced from the PC via a subnode
                        # hnid (exercises the ANSI data-tree walk)
                        chunk_bids = [
                            add(adata[a:a + 2000])
                            for a in range(0, len(adata), 2000)
                        ]
                        xb = struct.pack(
                            "<BBHI", 1, 1, len(chunk_bids), len(adata)
                        ) + b"".join(
                            struct.pack("<I", b) for b in chunk_bids
                        )
                        xbid = add(xb, internal=True)
                        hnid = 0x8021 + 0x40 * ai
                        att_sl = add(_sl_block({hnid: (xbid, 0)}),
                                     internal=True)
                        sl[anid] = (add(_pc_block({
                            PR_AFILE: (0x001F, _utf16(aname)),
                            PR_ADATA: (0x0102, hnid),
                        })), att_sl)
                    else:
                        sl[anid] = (add(_pc_block({
                            PR_AFILE: (0x001F, _utf16(aname)),
                            PR_ADATA: (0x0102, adata),
                        })), 0)
                sl[NID_ATTACH_TABLE] = (add(_tc_block(att_nids)), 0)
                bid_sub = add(_sl_block(sl), internal=True)
            nbt[mnid] = (bid_pc, bid_sub)
        nbt[(fnid & ~0x1F) | 0x0E] = (add(_tc_block(msg_nids)), 0)
    nbt[(NID_ROOT & ~0x1F) | 0x0D] = (add(_tc_block(folder_nids)), 0)

    return _assemble(blocks, nbt, crypt)


def _leaf_page(entries, cb_ent):
    page = bytearray(512)
    for k, e in enumerate(entries):
        page[k * cb_ent:(k + 1) * cb_ent] = e
    page[496] = len(entries)
    page[497] = 496 // cb_ent
    page[498] = cb_ent
    page[499] = 0               # cLevel: leaf
    return bytes(page)


def _btree(out, entries, keys, cb_ent):
    """Write a 1- or 2-level ANSI BTree for ``entries`` (packed leaf
    rows) with parallel ``keys``; returns the root page's ib.  Leaves
    hold up to 496//cb_ent rows; more than one leaf gets an
    intermediate page of 12-byte BTENTRYs (btkey u32, BREF(bid,ib))."""
    per = 496 // cb_ent
    leaf_refs = []
    for at in range(0, len(entries), per):
        ib = len(out)
        out += _leaf_page(entries[at:at + per], cb_ent)
        leaf_refs.append((keys[at], ib))
    if len(leaf_refs) == 1:
        return leaf_refs[0][1]
    inter = [struct.pack("<III", key, 0, ib) for key, ib in leaf_refs]
    assert len(inter) <= 496 // 12, "fixture too large for 2 levels"
    page = bytearray(_leaf_page(inter, 12))
    page[499] = 1               # cLevel: intermediate
    ib = len(out)
    out += bytes(page)
    return ib


def _assemble(blocks, nbt, crypt):
    out = bytearray(512)
    bbt_entries = []
    for bid in sorted(blocks):
        payload = blocks[bid]
        if crypt == 1 and not (bid & 2):
            payload = payload.translate(_ENCODE_TR)
        ib = len(out)
        out += payload
        bbt_entries.append((bid, ib, len(payload)))

    nbt_rows = [struct.pack("<IIII", nid, bd, bs, 0)
                for nid, (bd, bs) in sorted(nbt.items())]
    ib_nbt = _btree(out, nbt_rows, sorted(nbt), 16)
    bbt_rows = [struct.pack("<IIHH", bid, ib, cb, 1)
                for bid, ib, cb in bbt_entries]
    ib_bbt = _btree(out, bbt_rows, [b for b, _, _ in bbt_entries], 12)

    hdr = out
    hdr[0:4] = b"!BDN"
    struct.pack_into("<H", hdr, 10, 15)
    struct.pack_into("<I", hdr, 168, len(out))
    struct.pack_into("<II", hdr, 184, 1, ib_nbt)
    struct.pack_into("<II", hdr, 192, 2, ib_bbt)
    hdr[461] = crypt
    return bytes(out)
