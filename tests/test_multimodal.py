"""Multimodal binary-column plumbing: schema, Arrow UDF batch shape,
frame-sampling fan-out. The codec is stubbed (deterministic fake); the
Spark plumbing under test is real."""

from __future__ import annotations

from pyspark.sql import functions as F

from semtools_spark.operators import multimodal


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
