"""Multimodal binary-column plumbing: schema, Arrow UDF batch shape,
frame-sampling fan-out. The codec is stubbed (deterministic fake); the
Spark plumbing under test is real."""

from __future__ import annotations

from pyspark.sql import functions as F

from semtools_spark.operators import multimodal
from semtools_spark.operators import multimodal as MM


def test_decode_image_meta_schema_and_determinism(spark, documents):
    df = multimodal.attach_binary_payload(documents.limit(50))
    out = multimodal.decode_image_meta(df).select("doc_id", "img.*")
    assert dict(out.dtypes) == {
        "doc_id": "bigint", "n_bytes": "bigint",
        "width": "int", "height": "int", "fmt": "string",
    }
    rows = {r.doc_id: r for r in out.collect()}
    again = {r.doc_id: r for r in out.collect()}
    assert rows == again
    for r in rows.values():
        assert r.width == r.n_bytes % 512 + 32
        assert r.height == (r.n_bytes * 31) % 512 + 32
        assert r.fmt == "raw"


def test_frame_sample_fanout(spark, documents):
    df = multimodal.attach_binary_payload(documents.limit(20))
    frames = multimodal.frame_sample(df, frame_bytes=16, every_n=4)
    got = frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    sizes = {
        r.doc_id: len(r.media)
        for r in df.select("doc_id", "media").collect()
    }
    for r in got:
        n_frames = sizes[r.doc_id] // 16
        expected = (n_frames + 3) // 4  # every 4th of the full frames
        assert r.n == expected
    # frame bytes round-trip: frame k spans payload[k*16:(k+1)*16]
    one = frames.filter(F.col("frame_no") == 0).first()
    assert bytes(one.frame) == bytes(
        [r.media for r in df.filter(F.col("doc_id") == one.doc_id).collect()][0]
    )[:16]


# ---- header-only dimension sniffing (r8: image_meta) ----------------------


def _jpeg(w: int, h: int, progressive: bool = False) -> bytes:
    import struct as _s

    sof = 0xC2 if progressive else 0xC0
    return (
        b"\xff\xd8"                                   # SOI
        + b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
        + b"\xff\xdb" + _s.pack(">H", 67) + b"\x00" * 65               # DQT
        + bytes([0xFF, sof]) + _s.pack(">H", 11)
        + b"\x08" + _s.pack(">HH", h, w) + b"\x01\x01\x11\x00"         # SOF
        + b"\xff\xd9"                                                  # EOI
    )


def test_header_dimension_sniffers():
    import struct as _s

    from semtools_spark.operators.image_meta import (
        bmp_meta, gif_meta, jpeg_meta, sniff_dimensions,
    )

    assert jpeg_meta(_jpeg(640, 480)) == (640, 480)
    assert jpeg_meta(_jpeg(31, 7, progressive=True)) == (31, 7)
    gif = b"GIF89a" + _s.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert gif_meta(gif) == (320, 200)
    bmp = (
        b"BM" + _s.pack("<I", 100) + b"\x00\x00\x00\x00" + _s.pack("<I", 54)
        + _s.pack("<I", 40) + _s.pack("<ii", 64, -32)  # top-down: h < 0
    )
    assert bmp_meta(bmp) == (64, 32)
    assert sniff_dimensions(_jpeg(2, 3)) == (2, 3, "jpeg")
    assert sniff_dimensions(gif) == (320, 200, "gif")
    assert sniff_dimensions(bmp) == (64, 32, "bmp")
    # degrades: truncation, text payloads, "BM"-prefixed prose
    assert jpeg_meta(_jpeg(640, 480)[:8]) is None
    assert jpeg_meta(b"\xff\xd8\xff\xd9") is None  # EOI before any SOF
    assert gif_meta(b"GIF89a") is None
    assert bmp_meta(b"BMW cars are popular in many countries today") is None
    assert sniff_dimensions(b"plain text payload") is None
    assert sniff_dimensions(b"") is None


def test_decode_image_meta_reports_real_jpeg_gif_bmp_dims(spark):
    import struct as _s

    rows = [
        (1, _jpeg(640, 480)),
        (2, b"GIF87a" + _s.pack("<HH", 12, 34) + b"\x00"),
        (3, b"just words, no image magic"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {
        r.doc_id: (r.img.width, r.img.height, r.img.fmt)
        for r in MM.decode_image_meta(df).collect()
    }
    assert got[1] == (640, 480, "jpeg")
    assert got[2] == (12, 34, "gif")
    assert got[3][2] == "raw"  # stub path unchanged for unknown formats
