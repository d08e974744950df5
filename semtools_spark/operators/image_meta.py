"""Header-only image dimension parsers for the multimodal metadata path.

JPEG/GIF/BMP dimensions live in fixed-layout headers (ITU T.81 §B.2.2,
GIF89a §18, BITMAPINFOHEADER) — readable with stdlib ``struct`` and no
entropy decode, so ``decode_image_meta`` can report REAL width/height
for the three most common web formats after PNG without any codec
library. Full pixel decode for these stays out of scope (JPEG's DCT +
Huffman pipeline is not reproducible with stdlib alone); see
:mod:`multimodal` for the honest stub boundary.

Every parser is pure ``bytes -> (w, h) | None`` and degrades to ``None``
on anything malformed — never an exception (one corrupt crawl image must
not fail a partition).
"""

from __future__ import annotations

import struct

# SOF markers that carry the frame header (T.81 Table B.1): C0-C3, C5-C7,
# C9-CB, CD-CF — i.e. every CN except C4 (DHT), C8 (JPG ext), CC (DAC)
_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)
# standalone markers with NO length field (T.81 §B.1.1.3)
_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8)})  # TEM, RST0-7

_MAX_SEGMENTS = 1024  # marker-scan bound: headers sit well inside this


def jpeg_meta(data: bytes) -> "tuple[int, int] | None":
    """(width, height) from the first SOF frame header, or None."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    i = 2
    for _ in range(_MAX_SEGMENTS):
        # skip fill bytes (a marker may be preceded by any number of FFs)
        while i < len(data) and data[i] == 0xFF:
            i += 1
        if i <= 2 or i >= len(data) or data[i - 1] != 0xFF:
            return None
        marker = data[i]
        i += 1
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no SOF seen
            return None
        if marker in _STANDALONE:
            continue
        if i + 2 > len(data):
            return None
        (seg_len,) = struct.unpack_from(">H", data, i)
        if seg_len < 2:
            return None
        if marker in _SOF_MARKERS:
            if i + 7 > len(data):
                return None
            h, w = struct.unpack_from(">HH", data, i + 3)
            return (w, h) if w > 0 and h > 0 else None
        i += seg_len
    return None


def gif_meta(data: bytes) -> "tuple[int, int] | None":
    """(width, height) from the logical screen descriptor, or None."""
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack_from("<HH", data, 6)
    return (w, h) if w > 0 and h > 0 else None


def bmp_meta(data: bytes) -> "tuple[int, int] | None":
    """(width, height) from the DIB header, or None. Handles the
    universal BITMAPINFOHEADER family (size >= 40) and the legacy
    BITMAPCOREHEADER (size 12); height's sign encodes row order."""
    if len(data) < 26 or data[:2] != b"BM":
        return None
    # the two reserved WORDs must be zero in a real BMP — this is the
    # discriminator that keeps text payloads starting with "BM" (e.g.
    # "BMW …") from sniffing as bitmaps with garbage dimensions
    if data[6:10] != b"\x00\x00\x00\x00":
        return None
    (dib_size,) = struct.unpack_from("<I", data, 14)
    if dib_size >= 40 and len(data) >= 26:
        w, h = struct.unpack_from("<ii", data, 18)
    elif dib_size == 12:
        w, h = struct.unpack_from("<HH", data, 18)
    else:
        return None
    w, h = int(w), abs(int(h))
    return (w, h) if w > 0 and h > 0 else None


def sniff_dimensions(data: bytes) -> "tuple[int, int, str] | None":
    """(width, height, fmt) for any header-parsable format, else None.
    PNG is handled by :func:`png_decode.png_meta` (which also feeds the
    real pixel decoder); this covers the header-only trio."""
    for fn, fmt in ((jpeg_meta, "jpeg"), (gif_meta, "gif"), (bmp_meta, "bmp")):
        wh = fn(data)
        if wh is not None:
            return wh[0], wh[1], fmt
    return None
