"""Pure-Python binary ``.doc`` (Word 97-2003) text extractor for the
pluggable parse slot.

Legacy ``.doc`` files are OLE2 / Compound File Binary containers
([MS-CFB], public) holding a ``WordDocument`` stream whose text pieces
are located by a piece table in the ``0Table``/``1Table`` stream
([MS-DOC], public). Both layers parse with stdlib ``struct`` alone:

* **CFB layer** — header → DIFAT → FAT chains; the directory tree gives
  per-stream start sector + size; streams smaller than the mini-stream
  cutoff (4096) resolve through the mini-FAT inside the root entry's
  stream. Version 3 (512-byte sectors) and 4 (4096) both handled.
* **DOC layer** — the FIB at ``WordDocument[0]`` (magic 0xA5EC) selects
  the table stream (``fWhichTblStm``, flags bit 9) and points at the
  Clx (``fcClx``/``lcbClx`` at 0x1A2/0x1A6 — fixed for every nFib the
  piece-table era produced); the Clx's PlcPcd maps character positions
  to file offsets, each piece either 8-bit "Windows extended ANSI"
  (cp1252) or UTF-16LE. Pieces are emitted in CP order — the actual
  document order even when the file grew by appends. Old Word 6/95
  files (no piece table) fall back to the FIB's ``fcMin..fcMac`` text
  block.

Mapping: paragraph mark (0x0D) and the other break marks (0x0B vertical
tab, 0x0C page, 0x0E column) become line breaks; cell/row marks (0x07)
become tabs; field instructions (between the 0x13 and 0x14 field chars)
and object anchors (0x01, 0x08) are dropped; empty lines are dropped.

The reference accepts these via its generic document upload
(src/parse/client.rs:290-433). Deterministic pure function
``bytes -> str``; malformed CFB/FIB degrades to partial/empty text,
never a raise."""

from __future__ import annotations

import struct

__all__ = ["extract_doc_text", "is_ole2"]

_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_MAX_SECTORS = 1 << 20  # chain-walk bound: 512 MiB of 512-byte sectors


def is_ole2(data: bytes) -> bool:
    return data[:8] == _OLE_MAGIC


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


class _Cfb:
    """Minimal CFB reader: directory entries + stream extraction."""

    def __init__(self, data: bytes):
        if not is_ole2(data) or len(data) < 512:
            raise ValueError("not CFB")
        self.data = data
        shift = _u16(data, 30)
        if shift not in (9, 12):
            raise ValueError("bad sector shift")
        self.ssz = 1 << shift
        self.mini_cutoff = _u32(data, 56) or 4096
        # --- DIFAT: the FAT's own sector numbers ---
        difat = [_u32(data, 76 + 4 * i) for i in range(109)]
        nxt = _u32(data, 68)
        hops = 0
        while nxt not in (_ENDOFCHAIN, _FREESECT) and hops < 4096:
            sec = self._sector(nxt)
            if sec is None:
                break
            vals = struct.unpack_from(f"<{self.ssz // 4}I", sec)
            difat.extend(vals[:-1])
            nxt = vals[-1]
            hops += 1
        # --- FAT ---
        fat: list[int] = []
        for s in difat:
            if s in (_ENDOFCHAIN, _FREESECT):
                continue
            sec = self._sector(s)
            if sec is not None:
                fat.extend(struct.unpack_from(f"<{self.ssz // 4}I", sec))
        self.fat = fat
        # --- directory entries ---
        dir_bytes = self._chain_bytes(_u32(data, 48))
        self.entries: list[tuple[str, int, int, int]] = []  # name,type,start,size
        # slot-indexed mirror carrying the red-black-tree links (left,
        # right, child are directory SLOT ids) — needed to tell root-
        # storage streams from streams buried in embedded-object storages
        self._slots: "list[tuple[str, int, int, int, int, int, int] | None]" = []
        for off in range(0, len(dir_bytes) - 127, 128):
            e = dir_bytes[off : off + 128]
            nlen = _u16(e, 64)
            name = None
            if 2 <= nlen <= 64:
                try:
                    name = e[: nlen - 2].decode("utf-16-le")
                except UnicodeDecodeError:
                    name = None
            if name is None:
                self._slots.append(None)
                continue
            left, right, child = struct.unpack_from("<iii", e, 68)
            rec = (name, e[66], _u32(e, 116), _u32(e, 120))
            self.entries.append(rec)
            self._slots.append(rec + (left, right, child))
        # --- mini stream + mini FAT (loaded lazily on first small read) ---
        self._mini: "tuple[bytes, list[int]] | None" = None

    def _sector(self, n: int) -> "bytes | None":
        off = 512 + n * self.ssz
        if n >= _MAX_SECTORS or off + self.ssz > len(self.data) + self.ssz - 1:
            return None
        chunk = self.data[off : off + self.ssz]
        return chunk if chunk else None

    def _chain_bytes(self, start: int) -> bytes:
        out = []
        cur, hops = start, 0
        seen: set[int] = set()
        while cur not in (_ENDOFCHAIN, _FREESECT) and hops < _MAX_SECTORS:
            if cur in seen:  # cyclic FAT: malformed, stop
                break
            seen.add(cur)
            sec = self._sector(cur)
            if sec is None:
                break
            out.append(sec)
            cur = self.fat[cur] if cur < len(self.fat) else _ENDOFCHAIN
            hops += 1
        return b"".join(out)

    def _mini_layer(self) -> "tuple[bytes, list[int]]":
        if self._mini is None:
            root = next((e for e in self.entries if e[1] == 5), None)
            ministream = self._chain_bytes(root[2]) if root else b""
            minifat: list[int] = []
            cur, hops = _u32(self.data, 60), 0
            nminifat = _u32(self.data, 64)
            while (
                cur not in (_ENDOFCHAIN, _FREESECT)
                and hops < max(nminifat, 1) + 8
            ):
                sec = self._sector(cur)
                if sec is None:
                    break
                minifat.extend(struct.unpack_from(f"<{self.ssz // 4}I", sec))
                cur = self.fat[cur] if cur < len(self.fat) else _ENDOFCHAIN
                hops += 1
            self._mini = (ministream, minifat)
        return self._mini

    def _root_slot_ids(self) -> "set[int]":
        """Slot ids of the root storage's direct children (left/right
        sibling walk from the root's child slot — the child link of a
        sub-storage descends INTO it and is not followed)."""
        if getattr(self, "_root_ids", None) is None:
            self._root_ids: set[int] = set()
            root = next(
                (s for s in self._slots if s is not None and s[1] == 5), None
            )
            stack: list[int] = [root[6]] if root is not None else []
            while stack:
                i = stack.pop()
                if i < 0 or i >= len(self._slots) or i in self._root_ids:
                    continue
                self._root_ids.add(i)
                s = self._slots[i]
                if s is not None:
                    stack.extend((s[4], s[5]))  # siblings stay at this level
        return self._root_ids

    def root_stream_names(self) -> "set[str]":
        """Names of STREAM entries that are direct children of the root
        storage. Streams inside embedded-object storages (an Excel chart
        in a deck, a Word object in a sheet) are thereby excluded, which
        is what format dispatch must key on. Returns empty when the tree
        is unreadable — callers fall back to the flat list."""
        out: set[str] = set()
        for i in self._root_slot_ids():
            s = self._slots[i]
            if s is not None and s[1] == 2:
                out.add(s[0])
        return out

    def stream(self, name: str) -> "bytes | None":
        # prefer the entry REACHABLE FROM THE ROOT storage: an embedded
        # object's same-named stream ('Workbook' inside a deck's object
        # pool) can precede the root one in directory-slot order, and
        # incremental saves reorder slots freely
        e = None
        for i in self._root_slot_ids():
            s = self._slots[i]
            if s is not None and s[0] == name and s[1] == 2:
                e = s[:4]
                break
        if e is None:
            e = next((x for x in self.entries if x[0] == name and x[1] == 2), None)
        if e is None:
            return None
        _name, _t, start, size = e
        if size >= self.mini_cutoff:
            return self._chain_bytes(start)[:size]
        ministream, minifat = self._mini_layer()
        out = []
        cur, hops = start, 0
        seen: set[int] = set()
        while cur not in (_ENDOFCHAIN, _FREESECT) and hops < _MAX_SECTORS:
            if cur in seen:
                break
            seen.add(cur)
            out.append(ministream[cur * 64 : cur * 64 + 64])
            cur = minifat[cur] if cur < len(minifat) else _ENDOFCHAIN
            hops += 1
        return b"".join(out)[:size]


def _pieces_from_clx(clx: bytes) -> "list[tuple[int, int, int, bool]] | None":
    """Clx → [(cp_start, cp_end, file_offset, is_unicode)] ([MS-DOC]
    2.9.38): skip Prc entries (clxt=1), parse the Pcdt's PlcPcd."""
    i, n = 0, len(clx)
    while i < n:
        clxt = clx[i]
        if clxt == 0x01:  # Prc: i16 size + grpprl
            if i + 3 > n:
                return None
            cb = struct.unpack_from("<h", clx, i + 1)[0]
            if cb < 0:
                return None
            i += 3 + cb
        elif clxt == 0x02:  # Pcdt
            if i + 5 > n:
                return None
            lcb = _u32(clx, i + 1)
            plc = clx[i + 5 : i + 5 + lcb]
            if len(plc) < lcb or lcb < 4:
                return None
            npcd = (lcb - 4) // 12
            if npcd <= 0:
                return None
            cps = struct.unpack_from(f"<{npcd + 1}I", plc, 0)
            pieces = []
            base = 4 * (npcd + 1)
            for k in range(npcd):
                fc_field = _u32(plc, base + 8 * k + 2)
                compressed = bool(fc_field & 0x40000000)
                fc = fc_field & 0x3FFFFFFF
                off = fc // 2 if compressed else fc
                pieces.append((cps[k], cps[k + 1], off, not compressed))
            return pieces
        else:
            return None
    return None


#: Word's in-text control characters → extracted text
_DOC_MAP = {
    0x0D: "\n",  # paragraph mark
    0x0B: "\n",  # vertical tab (Shift+Enter)
    0x0C: "\n",  # page/section break
    0x0E: "\n",  # column break
    0x07: "\t",  # cell / row mark
    0x1E: "-",   # non-breaking hyphen
    0x1F: "",    # optional hyphen
    0x01: "",    # picture/OLE anchor
    0x08: "",    # drawn-object anchor
    0x05: "",    # annotation reference
    0x02: "",    # footnote reference
}


def _clean(raw: str) -> str:
    """Apply the control-char mapping and drop field instructions (text
    between field-begin 0x13 and field-separator 0x14; the field RESULT,
    after 0x14 up to field-end 0x15, is kept)."""
    out: list[str] = []
    in_instr = False
    for ch in raw:
        o = ord(ch)
        if o == 0x13:
            in_instr = True
            continue
        if o == 0x14:
            in_instr = False
            continue
        if o == 0x15:
            in_instr = False
            continue
        if in_instr:
            continue
        mapped = _DOC_MAP.get(o)
        if mapped is not None:
            out.append(mapped)
        elif o >= 0x20 or o == 0x09:
            out.append(ch)
    lines = [ln.rstrip() for ln in "".join(out).split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_doc_text(data: bytes) -> str:
    """Binary .doc bytes → extracted text, one line per paragraph."""
    try:
        return _extract_doc_from_cfb(_Cfb(data))
    except Exception:
        return ""


def _extract_doc_from_cfb(cfb: "_Cfb") -> str:
    """.doc extraction over an already-parsed CFB container (so the OLE2
    router in :mod:`ole_extract` walks the FAT once per document)."""
    try:
        word = cfb.stream("WordDocument")
        if word is None or len(word) < 0x200 or _u16(word, 0) != 0xA5EC:
            return ""
        flags = _u16(word, 10)
        table = cfb.stream("1Table" if flags & 0x0200 else "0Table")
        pieces = None
        if table is not None and len(word) >= 0x1AA:
            fc_clx, lcb_clx = _u32(word, 0x1A2), _u32(word, 0x1A6)
            if lcb_clx and fc_clx + lcb_clx <= len(table):
                pieces = _pieces_from_clx(table[fc_clx : fc_clx + lcb_clx])
        chunks: list[str] = []
        if pieces:
            for cp0, cp1, off, uni in pieces:
                nch = cp1 - cp0
                if nch <= 0 or nch > 1 << 26:
                    continue
                if uni:
                    seg = word[off : off + 2 * nch]
                    chunks.append(seg.decode("utf-16-le", "ignore"))
                else:
                    seg = word[off : off + nch]
                    chunks.append(seg.decode("cp1252", "ignore"))
        else:
            # Word 6/95 (or a broken Clx): the FIB's raw text block
            fc_min, fc_mac = _u32(word, 24), _u32(word, 28)
            if not fc_min < fc_mac <= len(word):
                return ""
            seg = word[fc_min:fc_mac]
            # old files are 8-bit; a null-heavy block means UTF-16LE
            if seg[1::2].count(0) > len(seg) // 4:
                chunks.append(seg.decode("utf-16-le", "ignore"))
            else:
                chunks.append(seg.decode("cp1252", "ignore"))
        return _clean("".join(chunks))
    except Exception:
        return ""
