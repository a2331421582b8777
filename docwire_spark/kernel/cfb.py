"""Minimal OLE2 / Compound File Binary reader (MS-CFB).

Shared substrate for the binary Office paths (DOC/XLS/PPT — reference
uses wv2 + its own OLE readers, src/oshared.h / wv2/olestream.*).
Covers: FAT chains, miniFAT, directory tree, stream extraction by
name.  No write support, no red-black tree validation (fixtures are
well-formed LibreOffice/Word exports).
"""

from __future__ import annotations

import struct

_HEADER_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


class CfbError(Exception):
    pass


class CfbFile:
    def __init__(self, data: bytes):
        if data[:8] != _HEADER_MAGIC:
            raise CfbError("not an OLE2 compound file")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        self.fat = self._load_fat()
        self.dir_entries = self._load_directory()
        self.minifat = self._load_minifat()
        self._mini_stream = None

    # -- sectors ---------------------------------------------------------
    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        return self.data[off : off + self.ssz]

    def _load_fat(self) -> list:
        difat = list(struct.unpack_from("<109I", self.data, 76))
        sect = self.difat_start
        guard = 0
        while sect not in (_ENDOFCHAIN, _FREESECT) and guard < self.n_difat + 1:
            block = self._sector(sect)
            vals = struct.unpack(f"<{self.ssz // 4}I", block)
            difat.extend(vals[:-1])
            sect = vals[-1]
            guard += 1
        fat = []
        for s in difat:
            if s in (_FREESECT, _ENDOFCHAIN):
                continue
            block = self._sector(s)
            if len(block) < self.ssz:
                break
            fat.extend(struct.unpack(f"<{self.ssz // 4}I", block))
        return fat

    def _chain(self, start: int, fat: list) -> list:
        chain = []
        sect = start
        seen = set()
        while sect not in (_ENDOFCHAIN, _FREESECT) and sect < len(fat):
            if sect in seen:
                raise CfbError("FAT cycle")
            seen.add(sect)
            chain.append(sect)
            sect = fat[sect]
        return chain

    def _read_chain(self, start: int) -> bytes:
        return b"".join(self._sector(s) for s in self._chain(start, self.fat))

    def _load_minifat(self) -> list:
        if self.minifat_start in (_ENDOFCHAIN, _FREESECT):
            return []
        raw = self._read_chain(self.minifat_start)
        return list(struct.unpack(f"<{len(raw) // 4}I", raw))

    # -- directory -------------------------------------------------------
    def _load_directory(self) -> list:
        raw = self._read_chain(self.dir_start)
        entries = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 64)
            if name_len < 2 or name_len > 64:
                entries.append(None)
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            etype = raw[off + 66]
            left, right, child = struct.unpack_from("<III", raw, off + 68)
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            entries.append((name, etype, start, size, left, right, child))
        return entries

    def _subtree_inorder(self, idx: int, out: list) -> None:
        """In-order red-black-tree walk (= CFB name order)."""
        if idx == 0xFFFFFFFF or idx >= len(self.dir_entries):
            return
        e = self.dir_entries[idx]
        if e is None:
            return
        self._subtree_inorder(e[4], out)
        out.append(idx)
        self._subtree_inorder(e[5], out)

    def children(self, storage_idx: int) -> list:
        """Directory-entry indices of a storage's children, in CFB
        name order."""
        e = self.dir_entries[storage_idx]
        out: list = []
        if e is not None:
            self._subtree_inorder(e[6], out)
        return out

    def find_child(self, storage_idx: int, name: str) -> int | None:
        for idx in self.children(storage_idx):
            if self.dir_entries[idx][0] == name:
                return idx
        return None

    def root_index(self) -> int:
        for i, e in enumerate(self.dir_entries):
            if e and e[1] == 5:
                return i
        raise CfbError("no root storage")

    def read_stream_at(self, idx: int) -> bytes:
        e = self.dir_entries[idx]
        if e is None or e[1] != 2:
            raise CfbError("not a stream")
        _n, _t, start, size = e[0], e[1], e[2], e[3]
        return self._read_stream_data(start, size)

    def _root(self):
        for e in self.dir_entries:
            if e and e[1] == 5:  # root storage
                return e
        raise CfbError("no root storage")

    def _mini(self) -> bytes:
        if self._mini_stream is None:
            root = self._root()
            self._mini_stream = self._read_chain(root[2])[: root[3]]
        return self._mini_stream

    def _read_stream_data(self, start: int, size: int) -> bytes:
        if size < self.mini_cutoff:
            mini = self._mini()
            out = []
            sect = start
            seen = set()
            while (
                sect not in (_ENDOFCHAIN, _FREESECT)
                and sect < len(self.minifat)
            ):
                if sect in seen:
                    raise CfbError("miniFAT cycle")
                seen.add(sect)
                out.append(mini[sect * self.mssz : (sect + 1) * self.mssz])
                sect = self.minifat[sect]
            return b"".join(out)[:size]
        return self._read_chain(start)[:size]

    # -- public ----------------------------------------------------------
    def stream_names(self) -> list:
        return [e[0] for e in self.dir_entries if e and e[1] == 2]

    def read_stream(self, name: str) -> bytes:
        for e in self.dir_entries:
            if e and e[1] == 2 and e[0] == name:
                return self._read_stream_data(e[2], e[3])
        raise KeyError(name)
