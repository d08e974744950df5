"""ODF (ODT/ODP/ODS), RTF, and binary .doc extractors — r8 breadth.

Fixtures are synthesized in-test (deterministic bytes, no binary blobs
in git): ODF as stdlib-zip OCF containers, RTF as literal control-word
streams, .doc via a minimal [MS-CFB] writer mirroring what Word 97+
emits (FAT, directory, mini-stream for the small Table stream)."""

from __future__ import annotations

import io
import struct
import zipfile

from semtools_spark.operators.doc_extract import extract_doc_text, is_ole2
from semtools_spark.operators.odf_extract import (
    extract_odp_text,
    extract_ods_text,
    extract_odt_text,
    odf_kind,
)
from semtools_spark.operators.pdf_extract import extract_any
from semtools_spark.operators.rtf_extract import extract_rtf_text, is_rtf

# ---- ODF fixtures ---------------------------------------------------------

_ODF_NS = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"'
)


def _odf(kind: str, body: str) -> bytes:
    mime = {
        "odt": "application/vnd.oasis.opendocument.text",
        "odp": "application/vnd.oasis.opendocument.presentation",
        "ods": "application/vnd.oasis.opendocument.spreadsheet",
    }[kind]
    content = (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content {_ODF_NS}>"
        f"<office:body>{body}</office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # OCF rule: mimetype first, STORED (uncompressed)
        zf.writestr(
            zipfile.ZipInfo("mimetype"), mime, compress_type=zipfile.ZIP_STORED
        )
        zf.writestr("content.xml", content)
    return buf.getvalue()


def test_odt_paragraphs_tabs_breaks_and_lists():
    doc = _odf(
        "odt",
        "<office:text>"
        "<text:h>Heading</text:h>"
        "<text:p>first<text:tab/>tabbed</text:p>"
        "<text:p>line<text:line-break/>break</text:p>"
        "<text:p>a<text:s text:c='3'/>b</text:p>"
        "<text:list><text:list-item><text:p>item one</text:p>"
        "</text:list-item></text:list>"
        "<text:p></text:p>"
        "<text:p><text:span>nested </text:span>span tail</text:p>"
        "</office:text>",
    )
    assert odf_kind(doc) == "odt"
    assert extract_odt_text(doc) == (
        "Heading\nfirst\ttabbed\nline\nbreak\na   b\nitem one\n"
        "nested span tail"
    )
    assert extract_any(doc) == extract_odt_text(doc)


def test_odp_slides_join_like_pages():
    doc = _odf(
        "odp",
        "<office:presentation>"
        "<draw:page><text:p>slide one</text:p><text:p>bullet</text:p>"
        "</draw:page>"
        "<draw:page><text:p>slide two</text:p></draw:page>"
        "<draw:page/>"
        "</office:presentation>",
    )
    assert odf_kind(doc) == "odp"
    assert extract_odp_text(doc) == "slide one\nbullet\n\nslide two"
    assert extract_any(doc) == extract_odp_text(doc)


def test_ods_rows_tabs_and_repeat_cap():
    doc = _odf(
        "ods",
        "<office:spreadsheet>"
        "<table:table>"
        "<table:table-row>"
        "<table:table-cell><text:p>a1</text:p></table:table-cell>"
        "<table:table-cell table:number-columns-repeated='2'>"
        "<text:p>x</text:p></table:table-cell>"
        "<table:table-cell table:number-columns-repeated='16384'/>"
        "</table:table-row>"
        "<table:table-row>"
        "<table:table-cell><text:p>b1</text:p></table:table-cell>"
        "</table:table-row>"
        "</table:table>"
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>sheet2</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:spreadsheet>",
    )
    assert odf_kind(doc) == "ods"
    out = extract_ods_text(doc)
    assert out == "a1\tx\tx\nb1\n\nsheet2"
    assert extract_any(doc) == out


def test_odf_malformed_degrades_empty():
    assert extract_odt_text(b"not a zip") == ""
    # valid zip, no content.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
    assert extract_odt_text(buf.getvalue()) == ""
    assert odf_kind(b"PK\x03\x04garbage") is None


# ---- RTF ------------------------------------------------------------------


def test_rtf_paragraphs_escapes_and_skip_groups():
    # raw newlines between fragments: RTF ignores bare CR/LF, and they
    # keep \par delimited (adjacent literals would fuse "\parUnicode"
    # into one unknown control word — correctly swallowed per spec)
    rtf = (
        rb"{\rtf1\ansi\ansicpg1252\deff0" b"\n"
        rb"{\fonttbl{\f0 Times New Roman;}}" b"\n"
        rb"{\colortbl ;\red0\green0\blue0;}" b"\n"
        rb"{\*\generator Writer}" b"\n"
        rb"{\info{\title secret title}}" b"\n"
        rb"\pard First paragraph.\par" b"\n"
        rb" Caf\'e9 costs 5 \'80.\par" b"\n"
        rb"Unicode: \u8212? dash and \u-10179?\u-8694? pair.\par" b"\n"
        rb"Tab\tab ed \{braces\} \\back\par" b"\n"
        rb"}"
    )
    assert is_rtf(rtf)
    out = extract_rtf_text(rtf)
    lines = out.split("\n")
    assert lines[0] == "First paragraph."
    assert lines[1] == "Caf\u00e9 costs 5 \u20ac."
    assert lines[2] == "Unicode: \u2014 dash and \U0001f60a pair."
    assert lines[3] == "Tab\ted {braces} \\back"
    assert "Times" not in out and "secret" not in out and "Writer" not in out
    assert extract_any(rtf) == out


def test_rtf_uc_skip_and_bin():
    # \uc2 means two fallback chars follow each \u escape
    rtf = rb"{\rtf1\uc2 A\u233 ??B\par\bin5 \x01\x02\x03C\par}"
    out = extract_rtf_text(rtf)
    assert out.split("\n")[0] == "A\u00e9B"
    assert is_rtf(b"plain text") is False
    assert extract_rtf_text(b"plain text") == ""


# ---- binary .doc ----------------------------------------------------------


def _cfb(streams: "dict[str, bytes]", non_root: "tuple[str, ...]" = ()) -> bytes:
    """Minimal CFB v3 writer: every stream placed in the main FAT (the
    mini-stream path is exercised via small_streams below). Streams named
    in ``non_root`` are parented under an ``ObjectPool`` STORAGE entry
    (the embedded-OLE-object layout) instead of the root storage."""
    SS = 512
    big = {n: v for n, v in streams.items() if len(v) >= 4096}
    small = {n: v for n, v in streams.items() if len(v) < 4096}
    # mini stream: concat of 64-byte-aligned small streams
    mini_data = bytearray()
    mini_start: dict[str, int] = {}
    for n, v in small.items():
        mini_start[n] = len(mini_data) // 64
        mini_data += v
        if len(mini_data) % 64:
            mini_data += bytes(64 - len(mini_data) % 64)
    # sector plan: [FAT][dir][miniFAT][ministream...][big streams...]
    sectors: list[bytes] = []

    def add(data: bytes) -> tuple[int, int]:
        start = len(sectors) + 1  # sector 0 will be the FAT itself
        for i in range(0, max(len(data), 1), SS):
            chunk = data[i : i + SS]
            sectors.append(chunk + bytes(SS - len(chunk)))
        return start, len(sectors) + 1 - start

    # directory entries
    def dirent(name: str, typ: int, start: int, size: int,
               right: int = -1, child: int = -1) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = typ
        e[67] = 1  # black
        struct.pack_into("<i", e, 68, -1)  # left sibling
        struct.pack_into("<i", e, 72, right)
        struct.pack_into("<i", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    chains: list[tuple[int, int]] = []  # (start, nsec) to thread in FAT
    # reserve: we lay out dir first (after FAT), then miniFAT, ministream,
    # then big streams; dir needs entry sector starts, so compute sizes
    names = list(streams)
    root_names = [n for n in names if n not in non_root]
    pool_names = [n for n in names if n in non_root]
    ndirent = 1 + len(names) + (1 if pool_names else 0)
    dir_bytes_len = ((ndirent * 128 + SS - 1) // SS) * SS

    # --- compute layout ---
    cur = 1  # sector 0 = FAT
    dir_start = cur
    cur += dir_bytes_len // SS
    # mini FAT: one sector enough for tests
    minifat_start = cur
    cur += 1
    ministream_start = cur
    mini_nsec = max(1, (len(mini_data) + SS - 1) // SS)
    cur += mini_nsec
    big_starts: dict[str, int] = {}
    for n, v in big.items():
        big_starts[n] = cur
        cur += (len(v) + SS - 1) // SS
    total_sectors = cur

    # --- FAT (single sector: supports up to 128 sectors) ---
    assert total_sectors <= 128, "test CFB too large"
    fat = [0xFFFFFFFF] * 128
    fat[0] = 0xFFFFFFFD  # FAT sector marker
    def chain(start: int, nsec: int) -> None:
        for k in range(nsec - 1):
            fat[start + k] = start + k + 1
        fat[start + nsec - 1] = 0xFFFFFFFE

    chain(dir_start, dir_bytes_len // SS)
    chain(minifat_start, 1)
    chain(ministream_start, mini_nsec)
    for n, v in big.items():
        chain(big_starts[n], (len(v) + SS - 1) // SS)

    # --- mini FAT ---
    minifat = [0xFFFFFFFF] * 128
    for n, v in small.items():
        s = mini_start[n]
        nsec = max(1, (len(v) + 63) // 64)
        for k in range(nsec - 1):
            minifat[s + k] = s + k + 1
        minifat[s + nsec - 1] = 0xFFFFFFFE

    # --- directory ---
    # slots: 0 = root; 1.. = root streams chained via right siblings,
    # then (optionally) the ObjectPool storage closing the root chain,
    # then the pool's streams chained via right siblings under its child
    slot_of = {n: 1 + i for i, n in enumerate(root_names)}
    pool_slot = 1 + len(root_names) if pool_names else -1
    for i, n in enumerate(pool_names):
        slot_of[n] = pool_slot + 1 + i
    dire = bytearray()
    root_child = 1 if (root_names or pool_names) else -1
    dire += dirent("Root Entry", 5, ministream_start, len(mini_data),
                   child=root_child)

    def right_of(idx: int, seq: "list[str]", tail: int = -1) -> int:
        return (slot_of[seq[idx + 1]] if idx + 1 < len(seq) else tail)

    for i, n in enumerate(root_names):
        v = streams[n]
        st = big_starts[n] if n in big else mini_start[n]
        dire += dirent(n, 2, st, len(v), right=right_of(i, root_names, pool_slot))
    if pool_names:
        dire += dirent("ObjectPool", 1, 0, 0, child=slot_of[pool_names[0]])
        for i, n in enumerate(pool_names):
            v = streams[n]
            st = big_starts[n] if n in big else mini_start[n]
            dire += dirent(n, 2, st, len(v), right=right_of(i, pool_names))
    dire += bytes(dir_bytes_len - len(dire))

    # --- assemble ---
    body = bytearray()
    body += struct.pack("<128I", *fat)  # sector 0
    body += dire
    body += struct.pack("<128I", *minifat)
    ms = bytes(mini_data) + bytes(mini_nsec * SS - len(mini_data))
    body += ms
    for n, v in big.items():
        body += v + bytes(((len(v) + SS - 1) // SS) * SS - len(v))

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 3)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", header, 44, 1)  # 1 FAT sector
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, 1)
    struct.pack_into("<i", header, 68, -2)  # no DIFAT chain
    for i in range(109):
        struct.pack_into("<i", header, 76 + 4 * i, -1)
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] = FAT sector 0
    return bytes(header) + bytes(body)


def _word_doc(paragraphs: "list[str]", unicode_piece: bool = True) -> bytes:
    """A Word97-shaped .doc: text pieces in the WordDocument stream, a
    Clx piece table in 1Table. Two pieces, deliberately stored in
    REVERSE file order to prove CP-order assembly."""
    text = "\r".join(paragraphs) + "\r"
    mid = len(text) // 2
    p1, p2 = text[:mid], text[mid:]
    word = bytearray(2048)
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 10, 0x0200)  # fWhichTblStm → 1Table
    # piece 2 stored FIRST in the file, piece 1 after it
    if unicode_piece:
        b2, b1 = p2.encode("utf-16-le"), p1.encode("utf-16-le")
        off2, off1 = 2048, 2048 + len(b2)
        fc2, fc1 = off2, off1  # unicode: fc = byte offset
    else:
        b2, b1 = p2.encode("cp1252"), p1.encode("cp1252")
        off2, off1 = 2048, 2048 + len(b2)
        fc2, fc1 = 0x40000000 | (off2 * 2), 0x40000000 | (off1 * 2)
    word += b2 + b1
    # Clx: Pcdt with 2 PCDs, CPs [0, mid, len]
    plc = struct.pack("<3I", 0, mid, len(text))
    plc += struct.pack("<HIH", 0, fc1, 0)
    plc += struct.pack("<HIH", 0, fc2, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = bytearray(64)  # fcClx = 64
    table += clx
    struct.pack_into("<I", word, 0x1A2, 64)
    struct.pack_into("<I", word, 0x1A6, len(clx))
    return _cfb({"WordDocument": bytes(word), "1Table": bytes(table)})


def test_doc_unicode_pieces_in_cp_order():
    doc = _word_doc(["Hello legacy Word", "second paragraph \u2014 ok"])
    assert is_ole2(doc)
    out = extract_doc_text(doc)
    assert out == "Hello legacy Word\nsecond paragraph \u2014 ok"
    assert extract_any(doc) == out


def test_doc_compressed_cp1252_pieces():
    doc = _word_doc(["caf\u00e9 ANSI text", "row\x07cell"], unicode_piece=False)
    out = extract_doc_text(doc)
    assert out.split("\n")[0] == "caf\u00e9 ANSI text"
    assert "row\tcell" in out


def test_doc_field_instructions_dropped():
    text = "before \x13HYPERLINK http://x\x14shown\x15 after"
    doc = _word_doc([text])
    assert extract_doc_text(doc) == "before shown after"


def test_doc_malformed_degrades_empty():
    assert extract_doc_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 100) == ""
    assert extract_doc_text(b"not ole2") == ""
    # truncated container: header only
    doc = _word_doc(["x"])
    assert extract_doc_text(doc[:512]) == ""


def test_ods_nonempty_repeat_bomb_capped():
    """r8 review: number-columns-repeated on a NON-empty cell was uncapped
    — one hostile cell with rep=500M reached ``[txt] * rep`` and OOMed an
    executor. Every repeat run is now capped, text-bearing or not."""
    doc = _odf(
        "ods",
        "<office:spreadsheet><table:table><table:table-row>"
        "<table:table-cell table:number-columns-repeated='500000000'>"
        "<text:p>x</text:p></table:table-cell>"
        "</table:table-row></table:table></office:spreadsheet>",
    )
    out = extract_ods_text(doc)  # must return promptly, not allocate 500M
    assert set(out.split("\t")) == {"x"}
    assert out.count("x") <= 256 + 1


def test_rtf_backslash_linefeed_is_par_alias():
    r"""r8 review: the control-symbol regex branch used ``.``, which never
    matches \n — a Unix-saved RTF using backslash-LF as its paragraph
    mark glued adjacent paragraphs together. Both EOL flavors newline."""
    assert extract_rtf_text(b"{\\rtf1 first\\\nsecond}") == "first\nsecond"
    assert extract_rtf_text(b"{\\rtf1 first\\\rsecond}") == "first\nsecond"


# ---- binary .xls / .ppt (r8: ole_extract) ----------------------------------

from semtools_spark.operators.ole_extract import (  # noqa: E402
    extract_ole2_text,
    extract_ppt_text,
    extract_xls_text,
)


def _biff(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def _bof(dt: int) -> bytes:
    return _biff(0x0809, struct.pack("<HH", 0x0600, dt) + bytes(12))


def _xls_fixture() -> bytes:
    """Two sheets; the SST deliberately SPLITS a string across a CONTINUE
    record (with its re-stated compression flag byte) — the corner that
    breaks naive SST readers."""
    # SST: 3 strings — "alpha", "bud|get" (split), "wide" (UTF-16)
    sst = struct.pack("<II", 3, 3)
    sst += struct.pack("<HB", 5, 0) + b"alpha"
    sst += struct.pack("<HB", 6, 0) + b"bud"          # 3 of 6 chars here
    cont = b"\x00" + b"get"                            # flag byte + rest
    cont += struct.pack("<HB", 4, 1) + "wide".encode("utf-16-le")
    globals_sub = (
        _bof(0x0005)
        + _biff(0x00FC, sst)
        + _biff(0x003C, cont)
        + _biff(0x000A, b"")
    )
    def labelsst(row, col, isst):
        return _biff(0x00FD, struct.pack("<HHHI", row, col, 0, isst))
    rk_042 = (42 << 2) | 0x03                         # int 42, /100
    rk_35 = struct.unpack("<I", struct.pack("<d", 3.5)[4:])[0] & 0xFFFFFFFC
    sheet1 = (
        _bof(0x0010)
        + labelsst(0, 0, 0) + labelsst(0, 1, 1) + labelsst(1, 0, 2)
        + _biff(0x0203, struct.pack("<HHH", 1, 1, 0) + struct.pack("<d", 7.0))
        + _biff(0x027E, struct.pack("<HHHI", 2, 0, 0, rk_042))
        + _biff(0x00BD, struct.pack("<HH", 2, 1)
                + struct.pack("<HI", 0, rk_35) + struct.pack("<HI", 0, rk_042)
                + struct.pack("<H", 2))
        + _biff(0x000A, b"")
    )
    label = struct.pack("<HHH", 0, 0, 0) + struct.pack("<HB", 6, 0) + b"inline"
    sheet2 = _bof(0x0010) + _biff(0x0204, label) + _biff(0x000A, b"")
    return _cfb({"Workbook": globals_sub + sheet1 + sheet2})


def test_xls_sst_continue_split_cells_and_rk():
    xls = _xls_fixture()
    assert is_ole2(xls)
    out = extract_xls_text(xls)
    assert out == (
        "alpha\tbudget\nwide\t7\n0.42\t3.5\t0.42"
        "\n\ninline"
    )
    assert extract_ole2_text(xls) == out
    assert extract_any(xls) == out


def _ppt_rec(ver_inst: int, rtype: int, body: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rtype, len(body)) + body


def _ppt_fixture() -> bytes:
    slwt = _ppt_rec(
        0x000F, 0x0FF0,
        _ppt_rec(0x0000, 0x03F3, bytes(20))
        + _ppt_rec(0x0000, 0x0FA0,
                   "Slide one title\rBullet point".encode("utf-16-le"))
        + _ppt_rec(0x0000, 0x03F3, bytes(20))
        + _ppt_rec(0x0000, 0x0FA8, b"Second slide\x0bsoft break"),
    )
    doc = _ppt_rec(0x000F, 0x03E8, slwt)
    return _cfb({"PowerPoint Document": doc, "Current User": bytes(24)})


def test_ppt_slides_group_by_persist_atoms():
    ppt = _ppt_fixture()
    out = extract_ppt_text(ppt)
    assert out == "Slide one title\nBullet point\n\nSecond slide\nsoft break"
    assert extract_ole2_text(ppt) == out
    assert extract_any(ppt) == out


def test_ole2_router_unknown_and_malformed_degrade():
    # unknown OLE2 (no recognized stream) → ""
    assert extract_ole2_text(_cfb({"SomeOtherStream": b"x" * 100})) == ""
    assert extract_ole2_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64) == ""
    assert extract_xls_text(b"junk") == ""
    assert extract_ppt_text(b"") == ""
    # truncated record walks stop cleanly
    xls = _xls_fixture()
    for cut in (600, 800, len(xls) - 9):
        extract_xls_text(xls[:cut] + bytes(len(xls) - cut))  # must not raise


def test_xls_sst_split_after_header_and_width_switch():
    """Two more SST/CONTINUE corners: (a) the split lands exactly AFTER
    a string's header — zero chars in the SST record, the CONTINUE still
    restates the flag byte; (b) the restated flag SWITCHES width
    (compressed header, UTF-16 continuation)."""
    sst = struct.pack("<II", 2, 2)
    sst += struct.pack("<HB", 3, 0) + b"abc"
    sst += struct.pack("<HB", 4, 0)              # header only; chars follow
    cont = b"\x01" + "wxyz".encode("utf-16-le")  # flag: now UTF-16
    globals_sub = (
        _bof(0x0005) + _biff(0x00FC, sst) + _biff(0x003C, cont)
        + _biff(0x000A, b"")
    )
    sheet = (
        _bof(0x0010)
        + _biff(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))
        + _biff(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1))
        + _biff(0x000A, b"")
    )
    out = extract_xls_text(_cfb({"Workbook": globals_sub + sheet}))
    assert out == "abc\twxyz"


def test_xls_biff5_inline_labels():
    """BIFF5 (Book stream, version word < 0x0600): no SST — text lives
    in inline LABEL records whose string is a byte-count XLUnicodeString
    without a flags byte."""
    bof5 = _biff(0x0809, struct.pack("<HH", 0x0500, 0x0005) + bytes(4))
    sheet_bof5 = _biff(0x0809, struct.pack("<HH", 0x0500, 0x0010) + bytes(4))
    label = struct.pack("<HHH", 0, 0, 0) + struct.pack("<H", 5) + b"five5"
    wb = bof5 + _biff(0x000A, b"") + sheet_bof5 + _biff(0x0204, label) + _biff(0x000A, b"")
    out = extract_xls_text(_cfb({"Book": wb}))
    assert out == "five5"


def test_ole2_router_ignores_embedded_object_streams():
    """r8 review: a deck with an embedded Excel chart also carries a
    'Workbook' stream (inside the embedded object's storage). Dispatch
    must key on ROOT-storage streams only, or the whole deck misroutes
    to the XLS extractor and every slide is lost."""
    slwt = _ppt_rec(
        0x000F, 0x0FF0,
        _ppt_rec(0x0000, 0x03F3, bytes(20))
        + _ppt_rec(0x0000, 0x0FA8, b"deck text survives"),
    )
    doc = _ppt_rec(0x000F, 0x03E8, slwt)
    wb = (  # a real little workbook, buried in the embedded object pool
        _bof(0x0005) + _biff(0x000A, b"")
        + _bof(0x0010)
        + _biff(0x0204, struct.pack("<HHH", 0, 0, 0)
                + struct.pack("<HB", 5, 0) + b"chart")
        + _biff(0x000A, b"")
    )
    deck = _cfb(
        {"PowerPoint Document": doc, "Workbook": wb},
        non_root=("Workbook",),
    )
    assert extract_ole2_text(deck) == "deck text survives"
    # and the reverse: a sheet with an embedded Word object stays .xls
    sheet = _cfb(
        {"Workbook": wb, "WordDocument": bytes(512)},
        non_root=("WordDocument",),
    )
    assert extract_ole2_text(sheet) == "chart"


def test_ppt_textbox_in_slide_container_groups_separately():
    """r8 review: textbox atoms live inside each Slide container (after
    the SlideListWithText in the stream); they must form their own
    slide group, not glue onto the last SLWT group."""
    slwt = _ppt_rec(
        0x000F, 0x0FF0,
        _ppt_rec(0x0000, 0x03F3, bytes(20))
        + _ppt_rec(0x0000, 0x0FA8, b"outline one")
        + _ppt_rec(0x0000, 0x03F3, bytes(20))
        + _ppt_rec(0x0000, 0x0FA8, b"outline two"),
    )
    slide1 = _ppt_rec(0x000F, 0x03EE, _ppt_rec(0x0000, 0x0FA8, b"textbox one"))
    slide2 = _ppt_rec(0x000F, 0x03EE, _ppt_rec(0x0000, 0x0FA8, b"textbox two"))
    doc = _ppt_rec(0x000F, 0x03E8, slwt + slide1 + slide2)
    out = extract_ppt_text(_cfb({"PowerPoint Document": doc}))
    assert out == "outline one\n\noutline two\n\ntextbox one\n\ntextbox two"


def test_ole2_dispatch_falls_back_when_root_walk_misses_format_stream():
    """r8 review: a directory tree whose root walk reaches SOME stream
    but not the format stream (cut sibling links from sloppy CFB
    writers) must fall back to the flat list, not return ""."""
    doc = _word_doc(["rescued by the flat fallback"])
    # re-wrap the WordDocument/1Table streams so neither is reachable
    # from the root chain (parented under ObjectPool), while a decoy
    # stream IS root-reachable — root walk finds no dispatch name
    from semtools_spark.operators.doc_extract import _Cfb

    word = _Cfb(doc).stream("WordDocument")
    table = _Cfb(doc).stream("1Table")
    broken = _cfb(
        {"CompObj": b"\x01decoy", "WordDocument": word, "1Table": table},
        non_root=("WordDocument", "1Table"),
    )
    cfb = _Cfb(broken)
    assert "WordDocument" not in cfb.root_stream_names()
    assert extract_ole2_text(broken) == "rescued by the flat fallback"
