"""Pure-Python binary ``.xls`` (BIFF5/BIFF8) and ``.ppt`` (PowerPoint
97-2003) text extractors, plus the one-CFB-parse OLE2 router for
``extract_any``.

Both formats live inside the same OLE2/CFB container as ``.doc``
(:mod:`doc_extract` owns that layer — the router parses the FAT ONCE per
document and dispatches on which named stream exists):

* **XLS** — the ``Workbook`` (BIFF8) / ``Book`` (BIFF5) stream is a
  sequence of ``(id, len, body)`` records ([MS-XLS], public). Text cells
  are ``LABELSST`` (index into the globals' ``SST`` shared-string table,
  whose strings may span ``CONTINUE`` records with a re-stated
  compression flag byte — §2.5.293), inline ``LABEL``/``RSTRING``, and
  numeric ``NUMBER``/``RK``/``MULRK`` cells (RK §2.5.217: 30-bit int or
  truncated IEEE double, optional ÷100). Output mirrors the XLSX
  extractor's shape (office_extract.py): one line of tab-separated cell
  values per row in (row, col) order, sheets (BOF..EOF substreams after
  the globals) joined with "\\n\\n". Formula results are skipped, same
  as un-cached XLSX formulas.
* **PPT** — the ``PowerPoint Document`` stream is a record tree
  ([MS-PPT]: recVer 0xF marks containers). Slide text lives in
  ``TextCharsAtom`` (UTF-16LE) / ``TextBytesAtom`` (low-byte) atoms;
  inside the ``SlideListWithText`` container each ``SlidePersistAtom``
  starts the next slide's run of atoms, which gives the page grouping
  (slides join with "\\n\\n", like PPTX/ODP). PPT's paragraph separator
  is CR (and 0x0B for soft breaks) → "\\n".

The reference accepts these via its generic document upload
(src/parse/client.rs:290-433). Deterministic pure functions
``bytes -> str``; malformed input degrades to partial/empty text, never
a raise (one corrupt document must not fail a partition)."""

from __future__ import annotations

import struct

from semtools_spark.operators.doc_extract import (
    _Cfb,
    _extract_doc_from_cfb,
    is_ole2,
)

__all__ = ["extract_xls_text", "extract_ppt_text", "extract_ole2_text"]

# ---- BIFF record ids -------------------------------------------------------
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_RSTRING = 0x00D6
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD

_MAX_SST_STRINGS = 1 << 22  # bound against a hostile declared count


def _records(stream: bytes):
    """Yield (id, body) for each BIFF record; truncation ends the walk."""
    i, n = 0, len(stream)
    while i + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, i)
        body = stream[i + 4 : i + 4 + ln]
        if len(body) < ln:
            return
        yield rid, body
        i += 4 + ln


class _Rdr:
    """Byte reader over the SST record + its CONTINUE bodies. ``read``
    spans chunk boundaries freely; ``read_chars`` re-reads the
    compression flag byte at each boundary it crosses mid-string
    ([MS-XLS] §2.5.293 — only CHARACTER data restates the flag)."""

    def __init__(self, chunks: "list[bytes]"):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.chunks[self.ci]) - self.off if self.ci < len(self.chunks) else 0

    def _hop(self) -> None:
        while self.ci < len(self.chunks) and self.off >= len(self.chunks[self.ci]):
            self.ci += 1
            self.off = 0

    def eof(self) -> bool:
        self._hop()
        return self.ci >= len(self.chunks)

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._hop()
            if self.ci >= len(self.chunks):
                raise ValueError("SST truncated")
            take = min(n, self._avail())
            out += self.chunks[self.ci][self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        out: list[str] = []
        # chunk whose flag byte (or in-chunk header) already covers the
        # char data we're reading; -1 = none yet. Char data found at
        # offset 0 of any OTHER chunk means the string was continued
        # there, and a CONTINUE restates the compression flag first —
        # including when the split lands exactly after the string header
        # (zero chars read yet). A header read from THIS chunk leaves
        # off > 0, so back-to-back strings inside one CONTINUE don't
        # re-read a flag that isn't there.
        covered = -1
        while cch > 0:
            self._hop()
            if self.ci >= len(self.chunks):
                raise ValueError("SST truncated")
            if self._avail() == 0:
                raise ValueError("empty chunk")
            if self.off == 0 and self.ci != covered:
                high = bool(self.read(1)[0] & 1)
                covered = self.ci
                continue
            covered = self.ci
            width = 2 if high else 1
            take = min(cch, self._avail() // width)
            if take == 0:
                raise ValueError("char split across boundary")
            raw = self.read(take * width)
            out.append(raw.decode("utf-16-le" if high else "latin-1", "ignore"))
            cch -= take
        return "".join(out)


def _parse_sst(chunks: "list[bytes]") -> "list[str]":
    """SST + CONTINUE bodies → shared strings (best-effort: a malformed
    tail keeps the strings decoded so far)."""
    r = _Rdr(chunks)
    out: list[str] = []
    try:
        _total, unique = struct.unpack("<II", r.read(8))
        for _ in range(min(unique, _MAX_SST_STRINGS)):
            if r.eof():
                break
            cch, flags = struct.unpack("<HB", r.read(3))
            high = bool(flags & 0x01)
            n_runs = struct.unpack("<H", r.read(2))[0] if flags & 0x08 else 0
            cb_ext = struct.unpack("<i", r.read(4))[0] if flags & 0x04 else 0
            out.append(r.read_chars(cch, high))
            r.read(4 * n_runs)          # rich runs: no flag byte restated
            if cb_ext > 0:
                r.read(cb_ext)          # ExtRst: likewise raw skip
    except (ValueError, struct.error):
        pass
    return out


def _rk_value(v: int) -> float:
    """RK number ([MS-XLS] §2.5.217): bit0 = ÷100, bit1 = int/double."""
    if v & 0x02:
        num = float(v >> 2 if v < 0x80000000 else (v >> 2) - (1 << 30))
    else:
        num = struct.unpack("<d", struct.pack("<Q", (v & 0xFFFFFFFC) << 32))[0]
    return num / 100 if v & 0x01 else num


def _fmt_num(x: float) -> str:
    """Deterministic cell rendering: integers bare, else shortest repr."""
    if x == int(x) and abs(x) < 1e16:
        return str(int(x))
    return repr(x)


def _inline_label(body: bytes, biff8: bool) -> "tuple[int, int, str] | None":
    """LABEL/RSTRING body → (row, col, text)."""
    if len(body) < 8:
        return None
    row, col = struct.unpack_from("<HH", body, 0)
    if biff8:
        if len(body) < 9:
            return None
        cch, flags = struct.unpack_from("<HB", body, 6)
        high = bool(flags & 0x01)
        width = 2 if high else 1
        raw = body[9 : 9 + cch * width]
        txt = raw.decode("utf-16-le" if high else "latin-1", "ignore")
    else:
        (cch,) = struct.unpack_from("<H", body, 6)
        txt = body[8 : 8 + cch].decode("latin-1", "ignore")
    return row, col, txt


def _xls_from_cfb(cfb: "_Cfb") -> str:
    stream = cfb.stream("Workbook")
    if stream is None:
        stream = cfb.stream("Book")
    if stream is None:
        return ""
    # pass 1: the globals substream's SST (+ its CONTINUEs)
    sst_chunks: "list[bytes] | None" = None
    in_sst_run = False  # CONTINUEs belong to SST only when adjacent to it
    biff8 = True
    n_bof = 0  # substreams are SEQUENTIAL: globals EOF, then sheet BOFs
    sheets: "list[dict[int, list[tuple[int, str]]]]" = []
    cells: "dict[int, list[tuple[int, str]]] | None" = None

    def put(row: int, col: int, txt: str) -> None:
        if cells is not None and txt:
            cells.setdefault(row, []).append((col, txt))

    for rid, body in _records(stream):
        if rid in (_BOF, _EOF):
            in_sst_run = False
        if rid == _BOF:
            n_bof += 1
            if n_bof == 1:  # workbook globals
                if len(body) >= 2:
                    biff8 = struct.unpack_from("<H", body, 0)[0] >= 0x0600
            else:  # a sheet substream begins
                cells = {}
                sheets.append(cells)
            continue
        if rid == _EOF:
            cells = None
            continue
        if rid == _SST:
            sst_chunks = [body]
            in_sst_run = True
            continue
        if rid == _CONTINUE:
            # a CONTINUE extends the SST only when it directly follows it
            # (CONTINUEs also extend TXO and others — appending those
            # would corrupt the string table)
            if in_sst_run and sst_chunks is not None:
                sst_chunks.append(body)
            continue
        in_sst_run = False
        if cells is None:
            continue
        if rid == _LABELSST and len(body) >= 10:
            row, col, _ixfe, isst = struct.unpack_from("<HHHI", body, 0)
            put(row, col, ("\x00", isst))  # resolve after SST parse
        elif rid in (_LABEL, _RSTRING):
            got = _inline_label(body, biff8)
            if got is not None:
                put(got[0], got[1], got[2])
        elif rid == _NUMBER and len(body) >= 14:
            row, col = struct.unpack_from("<HH", body, 0)
            (x,) = struct.unpack_from("<d", body, 6)
            put(row, col, _fmt_num(x))
        elif rid == _RK and len(body) >= 10:
            row, col = struct.unpack_from("<HH", body, 0)
            (v,) = struct.unpack_from("<I", body, 6)
            put(row, col, _fmt_num(_rk_value(v)))
        elif rid == _MULRK and len(body) >= 12:
            row, col0 = struct.unpack_from("<HH", body, 0)
            n = (len(body) - 6) // 6
            for k in range(n):
                (v,) = struct.unpack_from("<I", body, 4 + 6 * k + 2)
                put(row, col0 + k, _fmt_num(_rk_value(v)))

    shared = _parse_sst(sst_chunks) if sst_chunks else []
    out_sheets: list[str] = []
    for cs in sheets:
        lines: list[str] = []
        for row in sorted(cs):
            vals = []
            for _col, txt in sorted(cs[row], key=lambda t: t[0]):
                if isinstance(txt, tuple):  # deferred LABELSST
                    isst = txt[1]
                    txt = shared[isst] if isst < len(shared) else ""
                vals.append(txt)
            line = "\t".join(vals).rstrip("\t")
            if line.strip():
                lines.append(line)
        if lines:
            out_sheets.append("\n".join(lines))
    return "\n\n".join(out_sheets)


def extract_xls_text(data: bytes) -> str:
    """Binary .xls bytes → tab-separated rows, sheets joined "\\n\\n"."""
    try:
        return _xls_from_cfb(_Cfb(data))
    except Exception:
        return ""


# ---- PPT -------------------------------------------------------------------

_SLIDE_LIST_WITH_TEXT = 0x0FF0
_SLIDE_PERSIST_ATOM = 0x03F3
_SLIDE_CONTAINER = 0x03EE
_NOTES_CONTAINER = 0x03F0
_TEXT_CHARS_ATOM = 0x0FA0
_TEXT_BYTES_ATOM = 0x0FA8

_PPT_BREAKS = str.maketrans({"\r": "\n", "\x0b": "\n"})


def _ppt_walk(s: bytes, i: int, end: int, depth: int,
              in_slwt: bool, groups: "list[list[str]]") -> None:
    while i + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", s, i)
        i += 8
        stop = min(end, i + rlen)
        if (ver_inst & 0x000F) == 0x000F:  # container
            if depth < 32:
                # a Slide/Notes container is its own page: textbox atoms
                # inside it (OfficeArtClientTextbox) must not glue onto
                # the last SlideListWithText group
                if rtype in (_SLIDE_CONTAINER, _NOTES_CONTAINER):
                    groups.append([])
                _ppt_walk(s, i, stop, depth + 1,
                          in_slwt or rtype == _SLIDE_LIST_WITH_TEXT, groups)
        elif rtype == _SLIDE_PERSIST_ATOM and in_slwt:
            groups.append([])
        elif rtype in (_TEXT_CHARS_ATOM, _TEXT_BYTES_ATOM):
            raw = s[i:stop]
            txt = raw.decode(
                "utf-16-le" if rtype == _TEXT_CHARS_ATOM else "latin-1",
                "ignore",
            ).translate(_PPT_BREAKS)
            lines = [ln.rstrip() for ln in txt.split("\n")]
            lines = [ln for ln in lines if ln]
            if lines:
                if not groups:
                    groups.append([])
                groups[-1].extend(lines)
        i = stop
    return None


def _ppt_from_cfb(cfb: "_Cfb") -> str:
    stream = cfb.stream("PowerPoint Document")
    if stream is None:
        return ""
    groups: "list[list[str]]" = []
    try:
        _ppt_walk(stream, 0, len(stream), 0, False, groups)
    except Exception:
        pass
    return "\n\n".join("\n".join(g) for g in groups if g)


def extract_ppt_text(data: bytes) -> str:
    """Binary .ppt bytes → slide text, slides joined "\\n\\n"."""
    try:
        return _ppt_from_cfb(_Cfb(data))
    except Exception:
        return ""


# ---- router ----------------------------------------------------------------


def extract_ole2_text(data: bytes) -> str:
    """One CFB parse, then dispatch on which named stream exists:
    ``WordDocument`` → .doc, ``Workbook``/``Book`` → .xls,
    ``PowerPoint Document`` → .ppt. Unknown OLE2 (e.g. MSI, Outlook
    .msg) degrades to ""."""
    if not is_ole2(data):
        return ""
    try:
        cfb = _Cfb(data)
    except Exception:
        return ""
    # dispatch on ROOT-storage streams: a deck with an embedded Excel
    # chart also contains a 'Workbook' stream (inside the embedded
    # object's storage) and must still route as .ppt. Fall back to the
    # flat entry list whenever the root walk surfaces NO dispatchable
    # stream — not only when it is empty — so a directory tree whose
    # sibling links to the format stream are cut (sloppy third-party CFB
    # writers) still extracts instead of silently returning ""
    _DISPATCH = {"WordDocument", "Workbook", "Book", "PowerPoint Document"}
    names = cfb.root_stream_names()
    if not (names & _DISPATCH):
        names = {e[0] for e in cfb.entries if e[1] == 2}
    try:
        if "WordDocument" in names:
            return _extract_doc_from_cfb(cfb)
        if "Workbook" in names or "Book" in names:
            return _xls_from_cfb(cfb)
        if "PowerPoint Document" in names:
            return _ppt_from_cfb(cfb)
    except Exception:
        return ""
    return ""
