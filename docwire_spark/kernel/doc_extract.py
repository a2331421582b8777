"""Minimal binary DOC (Word 97-2003) -> document-element event stream.

Covers the text-extraction core of the reference's wv2-based DOC path
(reference: src/doc_parser.cpp + src/wv2/; full CHP/PAP formatting,
headers/footers, footnotes are out of scope):

- OLE2 via kernel/cfb.py; FIB -> CLX piece table in 0Table/1Table
  (fWhichTblStm), pieces decoded cp1252 (fc bit 30) or UTF-16LE
- character machine over the main text range [0, ccpText):
  \\r paragraph mark -> paragraph events; \\x07 cell mark ->
  table/row/cell events (double mark = row end); \\x0b -> break_line;
  \\x13/\\x14/\\x15 fields -> HYPERLINK instructions become link
  events, other field instructions are suppressed and results flow
- metadata from the \\x05SummaryInformation property set (author,
  last-saved-by, create/save times, page/word counts)

Byte-parity gate: tests/N.doc.out goldens.
"""

from __future__ import annotations

import datetime
import re
import struct

from docwire_spark.kernel import events as E
from docwire_spark.kernel.cfb import CfbFile

_HYPERLINK = re.compile(r'HYPERLINK\s+"([^"]*)"')
_HYPERLINK_UNQ = re.compile(r"HYPERLINK\s+(\S+)")


def _pieces(cfb: CfbFile):
    """Returns (wd_stream, table_stream, pieces, ccp_text) where
    pieces = [(cp_start, cp_end, fc, compressed)]."""
    wd = cfb.read_stream("WordDocument")
    flags = struct.unpack_from("<H", wd, 10)[0]
    which = (flags >> 9) & 1
    table = cfb.read_stream(f"{which}Table")
    ccp_text = struct.unpack_from("<i", wd, 0x4C)[0]
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, 0x01A2)
    clx = table[fc_clx : fc_clx + lcb_clx]
    i = 0
    while i < len(clx) and clx[i] == 1:  # Prc blocks precede the Pcdt
        cb = struct.unpack_from("<H", clx, i + 1)[0]
        i += 3 + cb
    if i >= len(clx) or clx[i] != 2:
        raise ValueError("no piece table in CLX")
    size = struct.unpack_from("<I", clx, i + 1)[0]
    plc = clx[i + 5 : i + 5 + size]
    n = (size - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces = []
    for j in range(n):
        fc_raw = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * j + 2)[0]
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            fc //= 2
        pieces.append((cps[j], cps[j + 1], fc, compressed))
    return wd, table, pieces, ccp_text


def _pieces_text(wd: bytes, pieces) -> str:
    parts = []
    for cp0, cp1, fc, compressed in pieces:
        count = cp1 - cp0
        if compressed:
            parts.append(wd[fc : fc + count].decode("cp1252", "replace"))
        else:
            parts.append(
                wd[fc : fc + 2 * count].decode("utf-16-le", "replace")
            )
    return "".join(parts)


def _fc_of_cp(pieces, cp: int) -> int | None:
    for cp0, cp1, fc, compressed in pieces:
        if cp0 <= cp < cp1:
            return fc + (cp - cp0) * (1 if compressed else 2)
    return None


def _sprm_walk(grpprl: bytes):
    """Yield (sprm_code, operand_bytes) from a Word97 grpprl."""
    i = 0
    n = len(grpprl)
    while i + 2 <= n:
        (code,) = struct.unpack_from("<H", grpprl, i)
        i += 2
        spra = code >> 13
        if spra in (0, 1):
            size = 1
        elif spra in (2, 4, 5):
            size = 2
        elif spra == 3:
            size = 4
        elif spra == 7:
            size = 3
        else:  # variable
            if code == 0xD608:  # sprmTDefTable
                if i + 2 > n:
                    return
                (size,) = struct.unpack_from("<H", grpprl, i)
                size -= 1
                i += 2
            else:
                if i >= n:
                    return
                size = grpprl[i]
                i += 1
        yield code, grpprl[i : i + size]
        i += size


class _PapxLookup:
    """fc -> (fInTable, fTtp) via PlcfBtePapx + PAPX FKPs
    (MS-DOC 2.8.7/2.9.175; reference wv2 word97_helper)."""

    def __init__(self, wd: bytes, table: bytes):
        fc_bte, lcb_bte = struct.unpack_from("<II", wd, 0x0102)
        plc = table[fc_bte : fc_bte + lcb_bte]
        n = (len(plc) - 4) // 8
        self.fcs = struct.unpack_from(f"<{n + 1}I", plc, 0)
        self.pns = struct.unpack_from(f"<{n}I", plc, 4 * (n + 1))
        self.wd = wd

    def flags(self, fc: int | None) -> tuple[bool, bool]:
        if fc is None:
            return (False, False)
        import bisect

        i = bisect.bisect_right(self.fcs, fc) - 1
        if i < 0 or i >= len(self.pns):
            return (False, False)
        page = self.wd[self.pns[i] * 512 : (self.pns[i] + 1) * 512]
        if len(page) < 512:
            return (False, False)
        crun = page[511]
        if crun == 0:
            return (False, False)
        rgfc = struct.unpack_from(f"<{crun + 1}I", page, 0)
        j = bisect.bisect_right(rgfc, fc) - 1
        if j < 0 or j >= crun:
            return (False, False)
        b_offset = page[(crun + 1) * 4 + j * 13]
        if b_offset == 0:
            return (False, False)
        off = b_offset * 2
        cb = page[off]
        if cb == 0:
            cb2 = page[off + 1]
            grpprl = page[off + 2 : off + 2 + 2 * cb2]
        else:
            grpprl = page[off + 1 : off + 1 + 2 * cb - 1]
        grpprl = grpprl[2:]  # skip istd
        in_table = ttp = False
        for code, operand in _sprm_walk(grpprl):
            if code == 0x2416 and operand:
                in_table = bool(operand[0])
            elif code == 0x2417 and operand:
                ttp = bool(operand[0])
        return (in_table, ttp)


def _char_machine(text: str, flags_of=None, comments=None, obj_texts=None) -> list:
    """Char stream -> events (see module docstring for the marks).

    Content events (text/links/breaks) buffer in ``pending`` until a
    paragraph mark or cell mark decides the wrapper; ``flags_of(cp)``
    supplies the paragraph's PAPX (fInTable, fTtp) so multi-paragraph
    cells and row-end marks are structural, not inferred."""
    if flags_of is None:
        flags_of = lambda _cp: (False, False)  # noqa: E731
    ev: list = [(E.DOCUMENT, None)]
    pending: list = []       # content events of the current para/cell
    buf: list[str] = []
    in_table = False
    in_row = False
    in_cell = False
    cell_events: list = []
    # field machine (reference doc_parser.cpp:411-489): chars between
    # \x13..\x14 accumulate as params, \x14..\x15 as value; at \x15
    # the keyword decides the rendering
    field_part = 0           # 0 none, 1 params, 2 value
    field_params: list[str] = []
    field_value: list[str] = []

    def flush():
        if buf:
            pending.append((E.TEXT, "".join(buf)))
            buf.clear()

    def field_end():
        params = "".join(field_params)
        value = "".join(field_value).replace("\x0b", "\n")
        stripped = params.lstrip(" ")
        keyword, _, rest = stripped.partition(" ")
        rest = rest.lstrip(" ")
        flush()
        if keyword == "HYPERLINK" and rest.startswith('"'):
            url = rest[1:].split('"', 1)[0]
            pending.append((E.LINK, (url, None)))
            if value:
                pending.append((E.TEXT, value))
            pending.append((E.CLOSE_LINK, None))
        elif keyword in ("FILLIN", "HYPERLINK"):
            text = (rest + " " + value).replace("\x0b", "\n")
            if text:
                pending.append((E.TEXT, text))
        elif keyword == "EMBED":
            # embedded OLE object text spliced in document order
            # (reference doc_parser.cpp:420-432 emits it at fieldStart;
            # the instruction is suppressed so position is identical)
            if obj_queue:
                obj = obj_queue.pop(0).replace("\x0b", "\n")
                if obj:
                    pending.append((E.TEXT, obj))
        else:
            if value:
                pending.append((E.TEXT, value))

    def close_table():
        nonlocal in_table, in_row, in_cell
        if in_cell:
            # unterminated cell (malformed doc): close it
            ev.append((E.TABLE_CELL, None))
            ev.extend(cell_events)
            cell_events.clear()
            ev.append((E.CLOSE_TABLE_CELL, None))
            in_cell = False
        if in_row:
            ev.append((E.CLOSE_TABLE_ROW, None))
            in_row = False
        if in_table:
            ev.append((E.CLOSE_TABLE, None))
            in_table = False

    def end_unit(mark: str, cp: int):
        """A paragraph unit ended at ``cp`` with mark '\\r'/'\\x07'."""
        nonlocal in_table, in_row, in_cell
        flush()
        f_in_table, f_ttp = flags_of(cp)
        if f_ttp:
            # row-end mark: close current row
            if in_cell:
                ev.append((E.TABLE_CELL, None))
                ev.extend(cell_events)
                cell_events.clear()
                ev.append((E.CLOSE_TABLE_CELL, None))
                in_cell = False
            if in_row:
                ev.append((E.CLOSE_TABLE_ROW, None))
                in_row = False
            pending.clear()
            return
        if f_in_table:
            if not in_table:
                ev.append((E.TABLE, None))
                in_table = True
            if not in_row:
                ev.append((E.TABLE_ROW, None))
                in_row = True
            in_cell = True
            cell_events.append((E.PARAGRAPH, None))
            cell_events.extend(pending)
            pending.clear()
            cell_events.append((E.CLOSE_PARAGRAPH, None))
            if mark == "\x07":  # cell end
                ev.append((E.TABLE_CELL, None))
                ev.extend(cell_events)
                cell_events.clear()
                ev.append((E.CLOSE_TABLE_CELL, None))
                in_cell = False
            return
        close_table()
        ev.append((E.PARAGRAPH, None))
        ev.extend(pending)
        pending.clear()
        ev.append((E.CLOSE_PARAGRAPH, None))
        # annotations referenced in this paragraph render right after
        # it (reference emits them at the NEXT paragraphStart —
        # byte-identical placement; doc_parser.cpp:343-352, 494-503)
        while comment_queue and comment_queue[0][0] <= cp:
            _cp, author, ctext = comment_queue.pop(0)
            ev.append((E.COMMENT, (author, None, ctext)))

    comment_queue = list(comments or [])
    obj_queue = list(obj_texts or [])
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if field_part and ch not in ("\x13", "\x14", "\x15", "\r", "\x07"):
            if ch >= " " or ch == "\t" or ch == "\x0b":
                (field_params if field_part == 1 else field_value).append(ch)
            i += 1
            continue
        if ch == "\x13":
            field_part = 1
            field_params = []
            field_value = []
        elif ch == "\x14":
            field_part = 2
        elif ch == "\x15":
            if field_part:
                field_end()
            field_part = 0
        elif ch in ("\r", "\x07"):
            end_unit(ch, i)
        elif ch == "\x0b":
            flush()
            pending.append((E.BREAK_LINE, None))
        elif ch in ("\x0c", "\x0e"):
            end_unit("\r", i)  # page/column break: paragraph-level
        elif ch >= " " or ch == "\t":
            buf.append(ch)
        # other control chars (\x01 object, \x02 footnote ref, \x08
        # drawn object, \x05 annotation ref) are dropped
        i += 1

    flush()
    if pending or buf:
        end_unit("\r", n - 1 if n else 0)
    close_table()
    for _cp, author, ctext in comment_queue:
        ev.append((E.COMMENT, (author, None, ctext)))
    ev.append((E.CLOSE_DOCUMENT, None))
    return ev


def _filetime(data: bytes, off: int):
    (v,) = struct.unpack_from("<Q", data, off)
    if v == 0:
        return None
    try:
        return datetime.datetime(1601, 1, 1) + datetime.timedelta(
            microseconds=v // 10
        )
    except OverflowError:
        return None


def _summary_metadata(cfb: CfbFile) -> dict:
    try:
        ps = cfb.read_stream("\x05SummaryInformation")
    except KeyError:
        return {}
    meta: dict = {}
    try:
        (n_sections,) = struct.unpack_from("<I", ps, 24)
        if n_sections < 1:
            return {}
        (sec_off,) = struct.unpack_from("<I", ps, 44)
        (sec_size, n_props) = struct.unpack_from("<II", ps, sec_off)
        props = {}
        for k in range(n_props):
            pid, off = struct.unpack_from("<II", ps, sec_off + 8 + 8 * k)
            props[pid] = sec_off + off
        codepage = "cp1252"
        if 1 in props:
            (cp,) = struct.unpack_from("<H", ps, props[1] + 4)
            if cp == 10000:
                codepage = "mac_roman"
            else:
                try:
                    "".encode().decode(f"cp{cp}")
                    codepage = f"cp{cp}"
                except (LookupError, ValueError):
                    pass

        def lpstr(pid):
            if pid not in props:
                return None
            off = props[pid]
            (vt,) = struct.unpack_from("<I", ps, off)
            if vt != 30:  # VT_LPSTR
                return None
            (cch,) = struct.unpack_from("<I", ps, off + 4)
            raw = ps[off + 8 : off + 8 + cch]
            return raw.split(b"\x00", 1)[0].decode(codepage, "replace")

        def ftime(pid):
            if pid not in props:
                return None
            off = props[pid]
            (vt,) = struct.unpack_from("<I", ps, off)
            if vt != 64:  # VT_FILETIME
                return None
            return _filetime(ps, off + 4)

        def vt_i4(pid):
            if pid not in props:
                return None
            off = props[pid]
            (vt,) = struct.unpack_from("<I", ps, off)
            if vt != 3:  # VT_I4
                return None
            (v,) = struct.unpack_from("<i", ps, off + 4)
            return v

        v = lpstr(4)  # PIDSI_AUTHOR
        if v:
            meta["author"] = v
        v = lpstr(8)  # PIDSI_LASTAUTHOR
        if v:
            meta["last_modified_by"] = v
        v = ftime(12)  # PIDSI_CREATE_DTM
        if v:
            meta["creation_date"] = v
        v = ftime(13)  # PIDSI_LASTSAVE_DTM
        if v:
            meta["last_modification_date"] = v
        v = vt_i4(14)  # PIDSI_PAGECOUNT
        if v is not None:
            meta["page_count"] = v
        v = vt_i4(15)  # PIDSI_WORDCOUNT
        if v is not None:
            meta["word_count"] = v
    except (struct.error, IndexError):
        pass
    return meta


def _annotations(wd: bytes, table: bytes, text: str, ccp_text: int):
    """[(ref_cp, author, comment_text)] sorted by ref_cp (reference
    parse_comments, doc_parser.cpp:148-291: PlcfandTxt CP ranges in
    the annotation sub-document, authors from GrpXstAtnOwners XSTs,
    ref CPs + ATRD ibst from PlcfandRef)."""
    fc_txt, lcb_txt = struct.unpack_from("<II", wd, 0xC2)
    if lcb_txt == 0:
        return []
    ccp_ftn = struct.unpack_from("<i", wd, 0x50)[0]
    ccp_hdd = struct.unpack_from("<i", wd, 0x54)[0]
    ccp_mcr = struct.unpack_from("<i", wd, 0x58)[0]
    ccp_atn = struct.unpack_from("<i", wd, 0x5C)[0]
    base = ccp_text + ccp_ftn + ccp_hdd + ccp_mcr
    plc = table[fc_txt : fc_txt + lcb_txt]
    cps = struct.unpack_from(f"<{len(plc) // 4}I", plc, 0)
    texts = []
    for j in range(len(cps) - 1):
        if cps[j] >= ccp_atn:
            break
        raw = text[base + cps[j] : base + cps[j + 1] - 1]
        out = []
        for ch in raw.lstrip("\x05"):
            # reference quirk: annotation chars are read as single
            # LOW bytes even for unicode pieces ("TODO: Unicode
            # support in comments", doc_parser.cpp:200-213) — 'ź'
            # renders as 'z' in the goldens
            o = ord(ch) & 0xFF
            if o >= 32 or 8 <= o <= 13:
                out.append("\n" if o == 13 else chr(o))
        texts.append("".join(out))
    # authors
    fc_own, lcb_own = struct.unpack_from("<II", wd, 0x1BA)
    owners = []
    pos = fc_own
    end = fc_own + lcb_own
    while pos + 2 <= end:
        (ln,) = struct.unpack_from("<H", table, pos)
        pos += 2
        if pos + 2 * ln > end:
            owners = []
            break
        owners.append(
            table[pos : pos + 2 * ln].decode("utf-16-le", "replace")
        )
        pos += 2 * ln
    # refs + ATRDs
    fc_ref, lcb_ref = struct.unpack_from("<II", wd, 0xBA)
    ref_cps = []
    pos = fc_ref
    while pos + 4 <= fc_ref + lcb_ref:
        (cp,) = struct.unpack_from("<I", table, pos)
        pos += 4
        if cp >= ccp_text:
            break
        ref_cps.append(cp)
    out = []
    atrd_base = fc_ref + 4 * (len(ref_cps) + 1)
    for i, cp in enumerate(ref_cps):
        if i >= len(texts):
            break
        author = ""
        off = atrd_base + 30 * i + 20
        if off + 2 <= fc_ref + lcb_ref:
            (ibst,) = struct.unpack_from("<H", table, off)
            if ibst < len(owners):
                author = owners[ibst]
        out.append((cp, author, texts[i]))
    return sorted(out)


def _object_pool_texts(cfb: CfbFile) -> list:
    """Embedded-object texts from the ObjectPool storage in CFB name
    order (reference doc_parser.cpp:629-663: sub-storages with a
    Workbook stream parse as XLS; others contribute an empty slot so
    EMBED fields stay aligned)."""
    try:
        root = cfb.root_index()
        pool = cfb.find_child(root, "ObjectPool")
        if pool is None:
            return []
        out = []
        for idx in cfb.children(pool):
            e = cfb.dir_entries[idx]
            obj_text = ""
            if e[1] == 1:  # storage
                wb_idx = cfb.find_child(idx, "Workbook")
                if wb_idx is not None:
                    from docwire_spark.kernel.xls_extract import (
                        _parse_workbook,
                    )

                    try:
                        obj_text = _parse_workbook(
                            cfb.read_stream_at(wb_idx)
                        )
                    except Exception:
                        obj_text = ""
            out.append(obj_text)
        return out
    except Exception:
        return []


def _story_events(text, base, cp0, cp1, flags_of):
    """Sub-document story -> content events (document wrapper and the
    story's trailing guard paragraph stripped)."""
    story = text[base + cp0 : base + cp1]
    if not story.strip("\r\x07\x0c"):
        return []
    # the story's final paragraph mark is a guard, not content
    if story.endswith("\r"):
        story = story[:-1]
    inner = _char_machine(
        story, (lambda cp: flags_of(base + cp0 + cp)) if flags_of else None
    )
    return inner[1:-1]  # strip DOCUMENT/CLOSE_DOCUMENT


def _header_footer_events(wd, table, text, ccp_text, flags_of):
    """Header/footer stories from PlcfHdd (MS-DOC 2.8.25: stories 0-5
    are separators; then per section hdrEven, hdrOdd, ftrEven, ftrOdd,
    hdrFirst, ftrFirst).  The reference renders them as header events
    before the body and footer events after it (doc_parser.cpp
    subdocument_handler; the plain-text writer buffers footer content
    until close_document)."""
    ccp_ftn = struct.unpack_from("<i", wd, 0x50)[0]
    ccp_hdd = struct.unpack_from("<i", wd, 0x54)[0]
    if ccp_hdd <= 0:
        return [], []
    fc_hdd, lcb_hdd = struct.unpack_from("<II", wd, 0xF2)
    if lcb_hdd < 8:
        return [], []
    plc = table[fc_hdd : fc_hdd + lcb_hdd]
    n = len(plc) // 4
    cps = struct.unpack_from(f"<{n}I", plc, 0)
    base = ccp_text + ccp_ftn

    def story(idx):
        if idx + 1 >= len(cps):
            return []
        return _story_events(text, base, cps[idx], cps[idx + 1], flags_of)

    header: list = []
    footer: list = []
    for idx in (6, 7, 10):  # hdrEven, hdrOdd, hdrFirst: first non-empty
        ev = story(idx)
        if ev:
            header = [(E.HEADER, None), *ev, (E.CLOSE_HEADER, None)]
            break
    for idx in (8, 9, 11):  # ftrEven, ftrOdd, ftrFirst
        ev = story(idx)
        if ev:
            footer = [(E.FOOTER, None), *ev, (E.CLOSE_FOOTER, None)]
            break
    return header, footer


def doc_to_events(data: bytes):
    """Returns (events, meta)."""
    cfb = CfbFile(data)
    wd, table, pieces, ccp_text = _pieces(cfb)
    text = _pieces_text(wd, pieces)
    try:
        papx = _PapxLookup(wd, table)

        def flags_of(cp):
            return papx.flags(_fc_of_cp(pieces, cp))

    except (struct.error, IndexError):
        flags_of = None
    try:
        comments = _annotations(wd, table, text, ccp_text)
    except (struct.error, IndexError):
        comments = []
    events = _char_machine(
        text[:ccp_text], flags_of, comments, _object_pool_texts(cfb)
    )
    try:
        header, footer = _header_footer_events(
            wd, table, text, ccp_text, flags_of
        )
    except (struct.error, IndexError):
        header, footer = [], []
    if header or footer:
        events = (
            [events[0]] + header + events[1:-1] + footer + [events[-1]]
        )
    return events, _summary_metadata(cfb)
