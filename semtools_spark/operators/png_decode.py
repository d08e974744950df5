"""Pure-Python PNG decoder (stdlib ``zlib`` + filter reconstruction) —
un-stubs the most common web image format in :mod:`multimodal`.

PNG is a public spec (RFC 2083 / ISO 15948): length-prefixed chunks, an
IHDR header, zlib-compressed scanlines each prefixed with a filter-type
byte. The five filters are the SAME five the PDF spec borrows for its
``/Predictor`` (ISO 32000-1 §7.4.4.4), so reconstruction reuses the
already-tested :func:`pdf_extract._unpredict`.

Scope (documented, not silent):

* **handled** — bit depth 8, color types 0 (greyscale), 2 (RGB),
  3 (palette → expanded to RGB), 4 (grey+alpha), 6 (RGBA),
  non-interlaced. That covers the overwhelming majority of web PNGs.
* **not handled** (returns None, callers degrade to the labeled stub) —
  bit depths 1/2/4/16, Adam7 interlace, malformed/truncated chunks.
  JPEG and other codecs remain honestly stubbed: their entropy coding
  is not reproducible with stdlib alone.

Deterministic pure functions; never raise."""

from __future__ import annotations

import struct
import zlib

__all__ = ["png_meta", "decode_png", "is_png"]

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: decompressed-pixel budget: a 1-KB "PNG bomb" can inflate to GBs;
#: one hostile crawl image must not OOM an executor
MAX_PIXEL_BYTES = 256 * 1024 * 1024


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def _chunks(data: bytes):
    i, n = 8, len(data)
    while i + 8 <= n:
        (length,) = struct.unpack_from(">I", data, i)
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if len(body) < length:
            return
        yield ctype, body
        i += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def png_meta(data: bytes) -> "tuple[int, int, int, int] | None":
    """(width, height, bit_depth, color_type) from IHDR, or None. Cheap:
    reads the first chunk only — metadata extraction at crawl scale must
    not decompress pixels."""
    if not is_png(data) or len(data) < 33:
        return None
    (length,) = struct.unpack_from(">I", data, 8)
    if data[12:16] != b"IHDR" or length < 13:
        return None
    w, h = struct.unpack_from(">II", data, 16)
    depth, ctype = data[24], data[25]
    if not (0 < w < 1 << 24 and 0 < h < 1 << 24):
        return None
    return w, h, depth, ctype


def decode_png(data: bytes) -> "tuple[int, int, int, bytes] | None":
    """PNG bytes → (width, height, channels, row-major pixel bytes), or
    None when out of scope/malformed. Palette images expand to RGB."""
    meta = png_meta(data)
    if meta is None:
        return None
    w, h, depth, ctype = meta
    if depth != 8 or ctype not in _CHANNELS:
        return None
    channels = _CHANNELS[ctype]
    # budget the OUTPUT size: palette (ctype 3) stores 1 byte/pixel but
    # expands to RGB (3 bytes/pixel) below — guarding on the stored width
    # would admit 3x the ceiling plus a 100M+-entry expansion pass
    out_channels = 3 if ctype == 3 else channels
    if w * h * out_channels > MAX_PIXEL_BYTES:
        return None
    interlace = data[28] if len(data) > 28 else 1
    if interlace != 0:
        return None
    plte = b""
    idat_parts: list[bytes] = []
    for ct, body in _chunks(data):
        if ct == b"IDAT":
            idat_parts.append(body)
        elif ct == b"PLTE":
            plte = body
    if not idat_parts:
        return None
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat_parts), (w * channels + 1) * h)
    except zlib.error:
        return None
    if len(raw) != (w * channels + 1) * h:
        return None
    from semtools_spark.operators.pdf_extract import _unpredict

    recon = _unpredict(
        raw,
        {"Predictor": 15, "Colors": channels, "BitsPerComponent": 8,
         "Columns": w},
    )
    if recon is None or len(recon) != w * h * channels:
        return None
    if ctype == 3:  # palette → RGB
        if len(plte) < 3:
            return None
        npal = len(plte) // 3
        if max(recon) >= npal:
            return None
        # one C-level gather instead of a per-pixel Python loop
        import numpy as np

        pal = np.frombuffer(plte[: npal * 3], dtype=np.uint8).reshape(-1, 3)
        idx = np.frombuffer(recon, dtype=np.uint8)
        return w, h, 3, pal[idx].tobytes()
    return w, h, channels, bytes(recon)
