"""Pure-Python PNG decoder (r8): filter reconstruction against a
hand-built independent encoder, palette expansion, degrade paths, and
the real-pixel Spark operator (multimodal.image_pixels)."""

from __future__ import annotations

import struct
import zlib

from semtools_spark.operators import multimodal
from semtools_spark.operators.png_decode import decode_png, is_png, png_meta


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _png(
    width: int,
    height: int,
    ctype: int,
    raw_rows: "list[bytes]",
    filters: "list[int]",
    plte: bytes = b"",
) -> bytes:
    """Independent test-side encoder: applies the chosen PNG filter to
    each raw scanline (spec algebra written forward here, reconstructed
    by the decoder under test)."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = channels
    scan = bytearray()
    prev = bytes(width * channels)
    for row, ft in zip(raw_rows, filters):
        scan.append(ft)
        if ft == 0:
            scan += row
        elif ft == 1:  # Sub
            scan += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(row))
            )
        elif ft == 2:  # Up
            scan += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        elif ft == 3:  # Average
            scan += bytes(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(len(row))
            )
        elif ft == 4:  # Paeth
            out = bytearray()
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((row[i] - pr) & 0xFF)
            scan += out
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    body += _chunk(b"IDAT", zlib.compress(bytes(scan)))
    body += _chunk(b"IEND", b"")
    return body


def test_all_five_filters_reconstruct_rgb():
    w, h = 5, 5
    rows = [
        bytes((r * 47 + c * 13 + ch * 5) & 0xFF for c in range(w) for ch in range(3))
        for r in range(h)
    ]
    png = _png(w, h, 2, rows, filters=[0, 1, 2, 3, 4])
    assert is_png(png)
    assert png_meta(png) == (w, h, 8, 2)
    dec = decode_png(png)
    assert dec is not None
    dw, dh, ch, pixels = dec
    assert (dw, dh, ch) == (w, h, 3)
    assert pixels == b"".join(rows)


def test_greyscale_and_rgba_and_grey_alpha():
    for ctype, channels in ((0, 1), (4, 2), (6, 4)):
        w, h = 4, 3
        rows = [
            bytes((r * 200 + i * 31) & 0xFF for i in range(w * channels))
            for r in range(h)
        ]
        dec = decode_png(_png(w, h, ctype, rows, filters=[4, 1, 3]))
        assert dec == (w, h, channels, b"".join(rows)), f"ctype={ctype}"


def test_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    rows = [bytes([0, 1, 2]), bytes([2, 1, 0])]
    dec = decode_png(_png(3, 2, 3, rows, filters=[0, 0], plte=plte))
    assert dec is not None
    w, h, ch, pixels = dec
    assert (w, h, ch) == (3, 2, 3)
    assert pixels == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )
    # palette index out of range: degrade, not raise
    bad = decode_png(_png(3, 1, 3, [bytes([7, 0, 0])], [0], plte=plte))
    assert bad is None


def test_out_of_scope_and_malformed_degrade():
    # 16-bit depth: meta reads, pixels decline
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    deep = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    assert png_meta(deep) == (2, 2, 16, 2)
    assert decode_png(deep) is None
    # interlaced: declined
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    inter = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    assert decode_png(inter) is None
    # truncated IDAT / wrong length: None, never raise
    good = _png(3, 3, 2, [bytes(9)] * 3, [0, 0, 0])
    assert decode_png(good[: len(good) - 20]) is None
    assert decode_png(b"\x89PNG\r\n\x1a\njunk") is None
    assert decode_png(b"") is None
    assert png_meta(b"notapng") is None


def test_decode_image_meta_uses_real_png_header(spark):
    png = _png(7, 9, 2, [bytes(21)] * 9, [0] * 9)
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(b"xx"))],
                               "doc_id: long, media: binary")
    out = {
        r.doc_id: r
        for r in multimodal.decode_image_meta(df).select("doc_id", "img.*").collect()
    }
    assert (out[1].width, out[1].height, out[1].fmt) == (7, 9, "png")
    assert out[2].fmt == "raw"  # stub path unchanged for non-PNG


def test_image_pixels_operator_known_values(spark):
    w, h = 4, 2
    rows = [bytes((r * 100 + i) & 0xFF for i in range(w * 3)) for r in range(h)]
    png = _png(w, h, 2, rows, filters=[1, 4])
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image")), (3, None)],
        "doc_id: long, media: binary",
    )
    got = {r.doc_id: r for r in multimodal.image_pixels(df).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (w, h, 3)
    assert bytes(got[1].pixels) == b"".join(rows)
    assert got[2].pixels is None and got[2].width is None
    assert got[3].pixels is None


def test_palette_budget_counts_expanded_bytes(monkeypatch):
    """r8 review: the pixel-bomb guard budgeted palette PNGs at their
    STORED width (1 byte/pixel) although decode expands them to RGB —
    admitting 3x the ceiling. The guard must count output bytes."""
    import semtools_spark.operators.png_decode as P

    plte = bytes([9, 8, 7] * 4)
    mk = lambda w: _png(w, 1, 3, [bytes(range(w)) if w <= 4 else bytes(w)],
                        [0], plte=plte)
    monkeypatch.setattr(P, "MAX_PIXEL_BYTES", 12)
    assert P.decode_png(mk(4)) is not None   # 4*1*3 = 12 <= 12
    assert P.decode_png(mk(5)) is None       # 5 stored bytes, 15 out > 12
